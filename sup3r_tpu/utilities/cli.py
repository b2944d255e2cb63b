"""CLI orchestration machinery: config -> per-node commands -> local
subprocess or SLURM submission, with JSON status tracking.

Replaces the reference's gaps/SLURM integration (reference:
sup3r/utilities/cli.py:38-373) with a self-contained jobstore: a
``.status.json`` per run directory records submitted/running/
successful/failed states and enables incremental pipeline restarts.
"""

import json
import logging
import os
import shlex
import subprocess
import time

logger = logging.getLogger(__name__)

STATUS_FILE = '.status.json'


class Status:
    """Tiny file-backed job status store."""

    def __init__(self, run_dir):
        self.run_dir = run_dir
        self.fp = os.path.join(run_dir, STATUS_FILE)

    def read(self):
        """Full status dict."""
        if os.path.exists(self.fp):
            with open(self.fp) as f:
                return json.load(f)
        return {}

    def update(self, module, job_name, **kwargs):
        """Merge a job record."""
        os.makedirs(self.run_dir, exist_ok=True)
        status = self.read()
        job = status.setdefault(module, {}).setdefault(job_name, {})
        job.update(kwargs)
        job['time'] = time.strftime('%Y-%m-%d %H:%M:%S')
        tmp = self.fp + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(status, f, indent=2)
        os.replace(tmp, self.fp)

    def job_status(self, module, job_name):
        """'successful' | 'failed' | 'running' | None."""
        return self.read().get(module, {}).get(job_name, {}).get(
            'job_status')

    def module_successful(self, module):
        """True if the module has jobs and all are successful."""
        jobs = self.read().get(module, {})
        return bool(jobs) and all(
            j.get('job_status') == 'successful' for j in jobs.values())


class BaseCLI:
    """Shared from_config flow for all module CLIs."""

    @staticmethod
    def run_local(cmd, module, job_name, run_dir):
        """Run a node command as a local subprocess, recording status."""
        status = Status(run_dir)
        if status.job_status(module, job_name) == 'successful':
            logger.info('Job %s/%s already successful; skipping.',
                        module, job_name)
            return 0
        status.update(module, job_name, job_status='running')
        result = subprocess.run(cmd, shell=True, capture_output=True,
                                text=True)
        ok = result.returncode == 0
        status.update(module, job_name,
                      job_status='successful' if ok else 'failed',
                      stderr=result.stderr[-2000:] if not ok else '')
        if not ok:
            logger.error('Job %s/%s failed:\n%s', module, job_name,
                         result.stderr[-2000:])
        return result.returncode

    @staticmethod
    def run_slurm(cmd, module, job_name, run_dir, alloc=None,
                  walltime=4, memory=None, feature=None):
        """Submit a node command via sbatch (pass-through)."""
        status = Status(run_dir)
        script = (f'#!/bin/bash\n#SBATCH --job-name={job_name}\n'
                  f'#SBATCH --time={int(walltime * 60)}\n')
        if alloc:
            script += f'#SBATCH --account={alloc}\n'
        if memory:
            script += f'#SBATCH --mem={memory}\n'
        if feature:
            script += f'#SBATCH {feature}\n'
        script += cmd + '\n'
        fp = os.path.join(run_dir, f'{job_name}.sbatch')
        os.makedirs(run_dir, exist_ok=True)
        with open(fp, 'w') as f:
            f.write(script)
        out = subprocess.run(['sbatch', fp], capture_output=True,
                             text=True)
        status.update(module, job_name, job_status='submitted',
                      sbatch_out=out.stdout.strip())
        return out.returncode

    @classmethod
    def kickoff_jobs(cls, module, cmds, config):
        """Dispatch one command per node by execution_control."""
        run_dir = config.get('run_dir', './')
        exec_ctrl = config.get('execution_control',
                               {'option': 'local'})
        option = exec_ctrl.get('option', 'local')
        codes = []
        for i, cmd in enumerate(cmds):
            job_name = f'{module}_{i}'
            if option == 'local':
                codes.append(cls.run_local(cmd, module, job_name,
                                           run_dir))
            else:
                kwargs = {k: v for k, v in exec_ctrl.items()
                          if k in ('alloc', 'walltime', 'memory',
                                   'feature')}
                codes.append(cls.run_slurm(cmd, module, job_name,
                                           run_dir, **kwargs))
        return codes


def load_config(config_file):
    """Read a JSON config file."""
    with open(config_file) as f:
        return json.load(f)
