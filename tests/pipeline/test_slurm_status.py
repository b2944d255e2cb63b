"""SLURM job-state machine tests with a fake sbatch — no scheduler
needed (reference: gaps Status transitions,
sup3r/utilities/cli.py:164-269)."""

import json
import os
import stat

import pytest

from sup3r_tpu.utilities.cli import BaseCLI, Status


def _fake_sbatch(tmp_path, run_immediately=True, job_id=4242):
    """A fake sbatch executable: prints the standard submission line
    and (optionally) runs the script synchronously in bash, so the
    sentinel exit file appears like a completed cluster job."""
    fp = tmp_path / 'fake_sbatch'
    body = '#!/bin/bash\n'
    if run_immediately:
        body += 'bash "$1" > /dev/null 2>&1\n'
    body += f'echo "Submitted batch job {job_id}"\n'
    fp.write_text(body)
    fp.chmod(fp.stat().st_mode | stat.S_IEXEC)
    return str(fp)


def test_submit_success_via_sentinel(tmp_path):
    """submit -> sentinel exit 0 -> poll -> successful."""
    run_dir = str(tmp_path / 'run')
    sbatch = _fake_sbatch(tmp_path)
    rc = BaseCLI.run_slurm('true', 'forward-pass', 'fwd_0', run_dir,
                           sbatch=sbatch)
    assert rc == 0
    status = Status(run_dir)
    job = status.read()['forward-pass']['fwd_0']
    assert job['job_status'] == 'submitted'
    assert job['job_id'] == '4242'
    assert os.path.exists(job['exit_file'])
    status.poll('forward-pass')
    job = status.read()['forward-pass']['fwd_0']
    assert job['job_status'] == 'successful'
    assert job['exit_code'] == '0'
    assert status.module_successful('forward-pass')


def test_submit_failure_via_sentinel(tmp_path):
    """A job whose command exits nonzero transitions to failed."""
    run_dir = str(tmp_path / 'run')
    sbatch = _fake_sbatch(tmp_path)
    BaseCLI.run_slurm('exit 3', 'forward-pass', 'fwd_0', run_dir,
                      sbatch=sbatch)
    status = Status(run_dir)
    status.poll()
    job = status.read()['forward-pass']['fwd_0']
    assert job['job_status'] == 'failed'
    assert job['exit_code'] == '3'
    assert status.module_failed('forward-pass')
    assert not status.module_successful('forward-pass')


def test_poll_via_squeue_sacct_hooks(tmp_path):
    """Without a sentinel, squeue/sacct hooks drive the transitions:
    PENDING -> RUNNING -> COMPLETED."""
    run_dir = str(tmp_path / 'run')
    sbatch = _fake_sbatch(tmp_path, run_immediately=False, job_id=77)
    BaseCLI.run_slurm('true', 'solar', 's_0', run_dir, sbatch=sbatch)
    status = Status(run_dir)
    assert status.job_status('solar', 's_0') == 'submitted'

    status.poll(squeue_fn=lambda j: 'PENDING', sacct_fn=lambda j: None)
    assert status.job_status('solar', 's_0') == 'submitted'
    status.poll(squeue_fn=lambda j: 'RUNNING', sacct_fn=lambda j: None)
    assert status.job_status('solar', 's_0') == 'running'
    # left the queue; sacct says COMPLETED
    status.poll(squeue_fn=lambda j: None,
                sacct_fn=lambda j: 'COMPLETED')
    assert status.job_status('solar', 's_0') == 'successful'


def test_poll_sacct_terminal_failures(tmp_path):
    run_dir = str(tmp_path / 'run')
    sbatch = _fake_sbatch(tmp_path, run_immediately=False, job_id=78)
    BaseCLI.run_slurm('true', 'qa', 'q_0', run_dir, sbatch=sbatch)
    status = Status(run_dir)
    status.poll(squeue_fn=lambda j: None,
                sacct_fn=lambda j: 'TIMEOUT')
    job = status.read()['qa']['q_0']
    assert job['job_status'] == 'failed'
    assert job['slurm_state'] == 'TIMEOUT'


def test_no_evidence_keeps_state(tmp_path):
    """No sentinel, no scheduler tools -> state unchanged (job may
    still be queued on a node that can't see squeue)."""
    run_dir = str(tmp_path / 'run')
    sbatch = _fake_sbatch(tmp_path, run_immediately=False, job_id=79)
    BaseCLI.run_slurm('true', 'qa', 'q_0', run_dir, sbatch=sbatch)
    status = Status(run_dir)
    status.poll(squeue_fn=lambda j: None, sacct_fn=lambda j: None)
    assert status.job_status('qa', 'q_0') == 'submitted'


def test_successful_job_not_resubmitted(tmp_path):
    """Resubmission of a successful job is refused (incremental
    restart contract; reference: utilities/cli.py:214-240)."""
    run_dir = str(tmp_path / 'run')
    sbatch = _fake_sbatch(tmp_path)
    BaseCLI.run_slurm('true', 'fp', 'j0', run_dir, sbatch=sbatch)
    Status(run_dir).poll()
    # second submit: skipped, sbatch script not rewritten
    script = os.path.join(run_dir, 'j0.sbatch')
    mtime = os.path.getmtime(script)
    rc = BaseCLI.run_slurm('false', 'fp', 'j0', run_dir, sbatch=sbatch)
    assert rc == 0
    assert os.path.getmtime(script) == mtime
    assert Status(run_dir).job_status('fp', 'j0') == 'successful'


def test_kickoff_jobs_slurm_with_injected_sbatch(tmp_path):
    """kickoff_jobs honors execution_control option=slurm with the
    injectable sbatch, producing pollable job records."""
    run_dir = tmp_path / 'run'
    sbatch = _fake_sbatch(tmp_path)
    codes = BaseCLI.kickoff_jobs(
        'forward-pass', ['true', 'true'],
        {'run_dir': str(run_dir),
         'execution_control': {'option': 'slurm', 'sbatch': sbatch,
                               'walltime': 1}})
    assert codes == [0, 0]
    status = Status(str(run_dir))
    jobs = status.read()['forward-pass']
    assert sorted(jobs) == ['forward-pass_0', 'forward-pass_1']
    # the fake sbatch runs synchronously, and each run_slurm polls the
    # module before submitting (live-job resubmit guard) — so job 0
    # may already show successful when job 1 is kicked off
    assert all(j['job_status'] in ('submitted', 'successful')
               for j in jobs.values())
    status.poll()
    assert status.module_successful('forward-pass')


def test_missing_sbatch_binary_marks_failed(tmp_path):
    """A broken scheduler environment records failed, not a crash."""
    run_dir = str(tmp_path / 'run')
    rc = BaseCLI.run_slurm('true', 'fp', 'j0', run_dir,
                           sbatch='/nonexistent/sbatch')
    assert rc != 0
    assert Status(run_dir).job_status('fp', 'j0') == 'failed'


def test_pipeline_cancel_marks_jobs(tmp_path):
    """pipeline --cancel transitions pending/running jobs to
    'canceled' and leaves terminal jobs alone."""
    import json

    from click.testing import CliRunner

    from sup3r_tpu.cli import main
    from sup3r_tpu.utilities.cli import Status

    status = Status(str(tmp_path))
    status.update('forward-pass', 'fwd_0', job_status='submitted',
                  job_id='12345')
    status.update('forward-pass', 'fwd_1', job_status='successful')
    status.update('data-collect', 'col_0', job_status='running',
                  job_id='12346')
    pipe_fp = str(tmp_path / 'config_pipeline.json')
    with open(pipe_fp, 'w') as f:
        json.dump({'pipeline': [{'forward-pass': 'x.json'}]}, f)

    runner = CliRunner()
    result = runner.invoke(main, ['-c', pipe_fp, 'pipeline',
                                  '--cancel'], obj={})
    assert result.exit_code == 0, result.output
    after = status.read()
    assert after['forward-pass']['fwd_0']['job_status'] == 'canceled'
    assert after['forward-pass']['fwd_1']['job_status'] == 'successful'
    assert after['data-collect']['col_0']['job_status'] == 'canceled'


def test_live_job_not_resubmitted(tmp_path):
    """A job still submitted/running (no completion evidence) must NOT
    be resubmitted — a duplicate SLURM job would double-write the same
    chunk outputs (round-5 review finding; reference refuses to
    resubmit any non-failed submitted job, utilities/cli.py:229-233).
    Once the sentinel shows a failure, resubmission proceeds."""
    run_dir = str(tmp_path / 'run')
    sbatch = _fake_sbatch(tmp_path, run_immediately=False, job_id=90)
    BaseCLI.run_slurm('true', 'fp', 'j0', run_dir, sbatch=sbatch)
    status = Status(run_dir)
    assert status.job_status('fp', 'j0') == 'submitted'
    script = os.path.join(run_dir, 'j0.sbatch')
    mtime = os.path.getmtime(script)
    exit_fp = status.read()['fp']['j0']['exit_file']

    # no sentinel, no scheduler evidence -> still live -> refuse
    rc = BaseCLI.run_slurm('true', 'fp', 'j0', run_dir, sbatch=sbatch)
    assert rc == 0
    assert os.path.getmtime(script) == mtime
    assert not os.path.exists(exit_fp), (
        'refused resubmit must not delete the live job sentinel path')
    assert status.job_status('fp', 'j0') == 'submitted'

    # the job dies: sentinel records a nonzero exit -> resubmit runs
    with open(exit_fp, 'w') as f:
        f.write('1')
    rc = BaseCLI.run_slurm('true', 'fp', 'j0', run_dir, sbatch=sbatch)
    assert rc == 0
    assert Status(run_dir).job_status('fp', 'j0') == 'submitted'


def test_walltime_string_config(tmp_path):
    """A quoted JSON walltime ('4') must parse as hours, not string-
    repeat into a absurd --time value (round-5 review finding)."""
    run_dir = str(tmp_path / 'run')
    sbatch = _fake_sbatch(tmp_path, run_immediately=False, job_id=91)
    BaseCLI.run_slurm('true', 'fp', 'j0', run_dir, sbatch=sbatch,
                      walltime='0.5')
    with open(os.path.join(run_dir, 'j0.sbatch')) as f:
        script = f.read()
    assert '#SBATCH --time=30\n' in script
