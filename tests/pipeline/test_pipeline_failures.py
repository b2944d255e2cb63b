"""Pipeline failure paths + full batch-project execution (mirrors
reference tests/pipeline/test_pipeline.py:100-533): a failing step
stops the pipeline and records 'failed'; fixing the config and
re-running resumes from the failed step; the batch module expands
permutations and runs each project's pipeline end-to-end."""

import json
import os

import h5py
import numpy as np
import pytest
from click.testing import CliRunner

from sup3r_tpu.cli import main
from sup3r_tpu.utilities.cli import Status
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from tests.forward_pass.test_forward_pass import (
    _s_gen_config,
    _save_model,
)


def _write(path, cfg):
    with open(path, 'w') as f:
        json.dump(cfg, f)
    return str(path)


@pytest.fixture
def project(tmp_path):
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (10, 10, 4), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _s_gen_config(), 2, 1,
                               is_5d=False)
    out_pattern = str(tmp_path / 'out' / 'chunk_{file_id}.h5')
    fwp_cfg = {
        'file_paths': input_file,
        'model_kwargs': {'model_dir': model_dir},
        'model_class': 'Sup3rGan',
        'fwp_chunk_shape': [10, 10, 4],
        'spatial_pad': 0, 'temporal_pad': 0,
        'out_pattern': out_pattern,
        'execution_control': {'option': 'local'},
    }
    return tmp_path, input_file, model_dir, out_pattern, fwp_cfg


def test_failing_step_blocks_pipeline(project):
    """A bad fwp config fails its step; the collect step never runs
    and the status records the failure."""
    tmp_path, input_file, model_dir, out_pattern, fwp_cfg = project
    bad_cfg = dict(fwp_cfg, model_kwargs={
        'model_dir': str(tmp_path / 'nonexistent_model')})
    _write(tmp_path / 'config_fwp.json', bad_cfg)
    out_file = str(tmp_path / 'collected.h5')
    _write(tmp_path / 'config_collect.json', {
        'file_paths': out_pattern.replace('{file_id}', '*'),
        'out_file': out_file,
        'execution_control': {'option': 'local'}})
    pipe_fp = _write(tmp_path / 'config_pipeline.json', {'pipeline': [
        {'forward-pass': 'config_fwp.json'},
        {'data-collect': 'config_collect.json'}]})

    runner = CliRunner()
    result = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                  '--monitor'], obj={})
    assert result.exit_code != 0
    assert not os.path.exists(out_file)
    status = Status(str(tmp_path)).read()
    fwp_keys = [k for k in status if k.startswith('forward-pass')]
    assert fwp_keys, 'failed step must still be recorded'
    assert any(j['job_status'] == 'failed'
               for k in fwp_keys for j in status[k].values())


def test_pipeline_resumes_after_fix(project):
    """After fixing the config, a re-run resumes: fwp reruns, collect
    completes, everything ends successful."""
    tmp_path, input_file, model_dir, out_pattern, fwp_cfg = project
    bad_cfg = dict(fwp_cfg, model_kwargs={
        'model_dir': str(tmp_path / 'nonexistent_model')})
    fwp_fp = _write(tmp_path / 'config_fwp.json', bad_cfg)
    out_file = str(tmp_path / 'collected.h5')
    _write(tmp_path / 'config_collect.json', {
        'file_paths': out_pattern.replace('{file_id}', '*'),
        'out_file': out_file,
        'execution_control': {'option': 'local'}})
    pipe_fp = _write(tmp_path / 'config_pipeline.json', {'pipeline': [
        {'forward-pass': 'config_fwp.json'},
        {'data-collect': 'config_collect.json'}]})

    runner = CliRunner()
    first = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                 '--monitor'], obj={})
    assert first.exit_code != 0

    _write(tmp_path / 'config_fwp.json', fwp_cfg)  # fix it
    second = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                  '--monitor'], obj={})
    assert second.exit_code == 0, second.output
    assert os.path.exists(out_file)
    st = Status(str(tmp_path))
    data = st.read()
    ok_fwp = [k for k in data if k.startswith('forward-pass')
              and st.module_successful(k)]
    ok_col = [k for k in data if k.startswith('data-collect')
              and st.module_successful(k)]
    assert ok_fwp and ok_col


def test_batch_runs_permutation_projects(project):
    """batch (non-dry-run) expands arg permutations into project dirs
    and runs each pipeline to completion."""
    tmp_path, input_file, model_dir, out_pattern, fwp_cfg = project
    # per-project out_pattern must differ -> use a relative pattern
    fwp_cfg = dict(fwp_cfg, out_pattern='./out/chunk_{file_id}.h5')
    _write(tmp_path / 'config_fwp.json', fwp_cfg)
    _write(tmp_path / 'config_collect.json', {
        'file_paths': './out/chunk_*.h5',
        'out_file': './collected.h5',
        'execution_control': {'option': 'local'}})
    _write(tmp_path / 'config_pipeline.json', {'pipeline': [
        {'forward-pass': 'config_fwp.json'},
        {'data-collect': 'config_collect.json'}]})
    batch_fp = _write(tmp_path / 'config_batch.json', {'sets': [{
        'args': {'spatial_pad': [0, 1]},
        'files': ['config_fwp.json', 'config_collect.json',
                  'config_pipeline.json']}]})

    runner = CliRunner()
    result = runner.invoke(main, ['-c', batch_fp, 'batch'], obj={})
    assert result.exit_code == 0, result.output
    dirs = sorted(p for p in tmp_path.iterdir()
                  if p.name.startswith('batch_'))
    assert len(dirs) == 2
    for d in dirs:
        cfg = json.load(open(d / 'config_fwp.json'))
        assert cfg['spatial_pad'] in (0, 1)
        collected = d / 'collected.h5'
        assert collected.exists(), f'missing output in {d}'
        with h5py.File(collected, 'r') as f:
            assert f['windspeed_100m'].shape == (4, 400)


def test_multiple_fwp_steps_in_one_pipeline(project):
    """Two forward-pass steps in one pipeline (the sup3rwind chain
    pattern) run independently: indexed status keys prevent the
    second step from being skipped as 'already successful' (reference:
    tests/pipeline/test_pipeline.py:384)."""
    tmp_path, input_file, model_dir, out_pattern, fwp_cfg = project
    cfg1 = dict(fwp_cfg,
                out_pattern=str(tmp_path / 'o1' / 'c_{file_id}.h5'))
    cfg2 = dict(fwp_cfg,
                out_pattern=str(tmp_path / 'o2' / 'c_{file_id}.h5'))
    _write(tmp_path / 'config_fwp1.json', cfg1)
    _write(tmp_path / 'config_fwp2.json', cfg2)
    pipe_fp = _write(tmp_path / 'config_pipeline.json', {'pipeline': [
        {'forward-pass': 'config_fwp1.json'},
        {'forward-pass': 'config_fwp2.json'}]})

    runner = CliRunner()
    result = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                  '--monitor'], obj={})
    assert result.exit_code == 0, result.output
    assert list((tmp_path / 'o1').glob('*.h5'))
    assert list((tmp_path / 'o2').glob('*.h5'))
    status = Status(str(tmp_path)).read()
    fwp_keys = [k for k in status if k.startswith('forward-pass#')]
    assert len(fwp_keys) == 2, status.keys()
    for key in fwp_keys:
        assert all(j['job_status'] == 'successful'
                   for j in status[key].values())


def test_edited_config_reruns_step(project):
    """Changing a step's config changes its identity: the edited step
    re-runs instead of being skipped as 'already successful' (caught
    in review — step keys are config-derived)."""
    tmp_path, input_file, model_dir, out_pattern, fwp_cfg = project
    _write(tmp_path / 'config_fwp.json', fwp_cfg)
    pipe_fp = _write(tmp_path / 'config_pipeline.json', {'pipeline': [
        {'forward-pass': 'config_fwp.json'}]})
    runner = CliRunner()
    first = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                 '--monitor'], obj={})
    assert first.exit_code == 0, first.output
    assert len(list((tmp_path / 'out').glob('*.h5'))) == 1

    # edit the config: new out_pattern -> new work
    cfg2 = dict(fwp_cfg,
                out_pattern=str(tmp_path / 'out2' / 'c_{file_id}.h5'))
    _write(tmp_path / 'config_fwp.json', cfg2)
    second = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                  '--monitor'], obj={})
    assert second.exit_code == 0, second.output
    assert list((tmp_path / 'out2').glob('*.h5')), \
        'edited step must re-run, not be skipped'

    # unchanged config on a third run IS skipped (outputs untouched)
    mtimes = {f: f.stat().st_mtime
              for f in (tmp_path / 'out2').glob('*.h5')}
    third = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                 '--monitor'], obj={})
    assert third.exit_code == 0
    for f, t in mtimes.items():
        assert f.stat().st_mtime == t
