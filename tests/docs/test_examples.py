"""Example configs stay loadable: every JSON parses and forward-pass
configs only use keys the strategy/CLI actually accept."""

import dataclasses
import json
import pathlib

import pytest

from sup3r_tpu.pipeline.strategy import ForwardPassStrategy

EXAMPLES = pathlib.Path(__file__).parents[2] / 'examples'
CLI_KEYS = {'execution_control', 'run_dir', 'max_nodes_cli'}


def _configs():
    return sorted(EXAMPLES.rglob('config_*.json'))


def test_examples_exist():
    assert _configs(), 'no example configs found'


@pytest.mark.parametrize('fp', _configs(), ids=lambda p: str(
    p.relative_to(EXAMPLES)))
def test_config_parses(fp):
    cfg = json.load(open(fp))
    assert isinstance(cfg, dict) and cfg


def test_fwp_configs_use_known_keys():
    fields = {f.name for f in dataclasses.fields(ForwardPassStrategy)}
    for fp in _configs():
        if 'fwp' not in fp.name:
            continue
        cfg = json.load(open(fp))
        unknown = set(cfg) - fields - CLI_KEYS
        assert not unknown, f'{fp}: unknown strategy keys {unknown}'


def test_pipeline_configs_reference_existing_steps():
    from sup3r_tpu.cli import main

    commands = set(main.commands)
    for fp in _configs():
        if 'pipeline' not in fp.name:
            continue
        cfg = json.load(open(fp))
        for step in cfg['pipeline']:
            (module, step_cfg), = step.items()
            assert module in commands, f'{fp}: unknown step {module}'
            assert (fp.parent / step_cfg).exists(), \
                f'{fp}: missing step config {step_cfg}'
