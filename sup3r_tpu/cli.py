"""sup3r-tpu command line interface.

Reference parity: sup3r/cli.py:21-461 (click group with forward-pass,
solar, bias-calc, data-collect, qa, pipeline, batch commands driven by
JSON configs with an execution_control block).
"""

import contextlib
import hashlib
import itertools
import json
import logging
import os
import shlex
import time

import click
import numpy as np

import sup3r_tpu
from sup3r_tpu.utilities.cli import BaseCLI, Status, load_config

logger = logging.getLogger(__name__)


def _cfg_tag(run_cfg):
    """Stable short hash of a run config — job names carry it so two
    different configs sharing a run_dir never skip each other's jobs
    through the already-successful check."""
    blob = json.dumps(run_cfg, sort_keys=True, default=str)
    return hashlib.md5(blob.encode()).hexdigest()[:6]


def _node_cmd(module, config, node_index, run_dir,
              status_module=None):
    """python -c command running one node of a module, reading its
    config from a file (robust to shell quoting; analogous to the
    reference's get_node_cmd strings, reference:
    sup3r/pipeline/forward_pass.py:339-382). ``status_module``
    disambiguates node-config file names when the same module appears
    multiple times in one pipeline."""
    cfg = dict(config)
    cfg['node_index'] = node_index
    cfg.pop('execution_control', None)
    cfg.pop('run_dir', None)
    os.makedirs(run_dir, exist_ok=True)
    name = (status_module or module).replace('#', '-')
    cfg_fp = os.path.join(
        run_dir, f'.{name}_{_cfg_tag(config)}_node{node_index}.json')
    with open(cfg_fp, 'w') as f:
        json.dump(cfg, f)
    runners = {
        'forward-pass': (
            'from sup3r_tpu.pipeline import ForwardPass, '
            'ForwardPassStrategy;'
            'node = cfg.pop(\'node_index\');'
            'strategy = ForwardPassStrategy(**cfg);'
            'ForwardPass.run(strategy, node)'),
        'solar': (
            'from sup3r_tpu.solar import Solar;'
            'node = cfg.pop(\'node_index\');'
            'Solar.run_temporal_chunks(node_index=node, **cfg)'),
        'data-collect': (
            'from sup3r_tpu.postprocessing.collectors import '
            'CollectorH5, CollectorNC;'
            'cfg.pop(\'node_index\');'
            'cls = CollectorH5 if str(cfg.get(\'out_file\')).endswith'
            '(\'.h5\') else CollectorNC;'
            'cls.collect(**cfg)'),
        'qa': (
            'from sup3r_tpu.qa import Sup3rQa;'
            'cfg.pop(\'node_index\');'
            'Sup3rQa(**cfg).run()'),
    }
    body = runners[module]
    # SUP3R_TPU_PLATFORM lets tests/CI pin node subprocesses to CPU
    # (this image pins JAX_PLATFORMS=axon via sitecustomize, so plain
    # env overrides do not work — see .claude/skills/verify/SKILL.md)
    prefix = (
        "import os, json;"
        "p = os.environ.get('SUP3R_TPU_PLATFORM');"
        "import jax;"
        "jax.config.update('jax_platforms', p) if p else None;")
    # per-node log files: log_file/log_level config keys are consumed
    # here (never passed to the module classes); the pattern may
    # contain {node_index}
    log_init = (
        "from sup3r_tpu.utilities.cli import init_node_logger;"
        "init_node_logger(cfg.pop('log_file', None), "
        "cfg.pop('log_level', 'INFO'), cfg.get('node_index'));")
    # shlex.quote the whole -c payload: cfg_fp embeds run_dir, and a
    # path containing $ ` or " would otherwise be shell-expanded or
    # break the quoting entirely
    payload = (f'{prefix} cfg = json.load(open({cfg_fp!r})); '
               f'{log_init}{body}')
    return f'python -c {shlex.quote(payload)}'


@click.group()
@click.version_option(version=sup3r_tpu.__version__)
@click.option('--config_file', '-c', default=None,
              type=click.Path(exists=True),
              help='JSON config file for the requested command.')
@click.option('-v', '--verbose', is_flag=True)
@click.pass_context
def main(ctx, config_file, verbose):
    """sup3r-tpu: TPU-native super resolution for renewable resource
    data."""
    ctx.ensure_object(dict)
    ctx.obj['CONFIG_FILE'] = config_file
    level = logging.DEBUG if verbose else logging.INFO
    logging.basicConfig(level=level)


def _status_module(ctx, default):
    """Status-store key for this command invocation — the pipeline
    runner overrides it when a module appears more than once so two
    forward-pass steps don't collide in .status.json."""
    return (ctx.obj or {}).get('STATUS_MODULE', default)


def _get_config(ctx):
    config_file = ctx.obj.get('CONFIG_FILE')
    if config_file is None:
        raise click.UsageError(
            'A config file is required: sup3r-tpu -c config.json '
            '<command>')
    config = load_config(config_file)
    config.setdefault('run_dir',
                      os.path.dirname(os.path.abspath(config_file)))
    # node jobs run with cwd=run_dir; a relative run_dir would
    # double-resolve the embedded node-config paths
    config['run_dir'] = os.path.abspath(config['run_dir'])
    return config


@contextlib.contextmanager
def _in_dir(path):
    """Run the parent-process part of a module command from the
    project dir, so config-relative paths (out_pattern, cache dirs)
    resolve exactly as they do in the node subprocesses (which run
    with cwd=run_dir)."""
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


@main.command()
@click.pass_context
def forward_pass(ctx):
    """Run chunked forward passes from a config."""
    from sup3r_tpu.pipeline import ForwardPassStrategy

    config = _get_config(ctx)
    run_cfg = {k: v for k, v in config.items()
               if k not in ('execution_control', 'run_dir',
                            'max_nodes_cli')}
    with _in_dir(config['run_dir']):
        # head_node: plan node_chunks without the exo/bias preflight
        # the worker nodes will do themselves (log_file/log_level are
        # node-runner keys, consumed by _node_cmd's log init)
        strategy = ForwardPassStrategy(
            **{k: v for k, v in run_cfg.items()
               if k not in ('log_file', 'log_level')},
            head_node=True)
        n_nodes = len(strategy.node_chunks)
        # freeze the node plan HERE and ship it to every node: with
        # redistribute_chunks each node re-deriving the plan at its
        # own (staggered) start time would see a different set of
        # finished chunks and orphan work (strategy.node_chunks_plan)
        run_cfg = {**run_cfg, 'node_chunks_plan': [
            [int(x) for x in c] for c in strategy.node_chunks]}
        # ship expensive head-computed preflight artifacts to the
        # nodes (the chunked_io NCforCC per-pixel clearsky scale
        # raster is a full NSRDB scan — workers must not redo it N
        # times). Arrays go through a run_dir .npy side file since
        # node configs are JSON.
        scale = getattr(strategy, '_chunk_ihk', {}).get(
            'clearsky_scale')
        if scale is not None:
            if isinstance(scale, np.ndarray):
                scale_fp = os.path.abspath(os.path.join(
                    config['run_dir'],
                    f'.clearsky_scale_{_cfg_tag(run_cfg)}.npy'))
                np.save(scale_fp, scale)
                scale = scale_fp
            ihk = dict(run_cfg.get('input_handler_kwargs') or {})
            ihk['clearsky_scale'] = scale
            run_cfg = {**run_cfg, 'input_handler_kwargs': ihk}
    module = _status_module(ctx, 'forward-pass')
    cmds = [_node_cmd('forward-pass', run_cfg, i, config['run_dir'],
                      status_module=module) for i in range(n_nodes)]
    codes = BaseCLI.kickoff_jobs(module, cmds, config,
                                 job_tag=_cfg_tag(run_cfg))
    if any(codes):
        raise click.ClickException('Some forward-pass jobs failed')


@main.command()
@click.pass_context
def solar(ctx):
    """Run the solar irradiance module from a config. ``max_nodes``
    fans temporal chunks out over that many jobs (reference:
    sup3r/solar/solar.py:584 one job per temporal-chunk split)."""
    config = _get_config(ctx)
    run_cfg = {k: v for k, v in config.items()
               if k not in ('execution_control', 'run_dir')}
    n_nodes = int(run_cfg.get('max_nodes') or 1)
    module = _status_module(ctx, 'solar')
    cmds = [_node_cmd('solar', run_cfg, i, config['run_dir'],
                      status_module=module) for i in range(n_nodes)]
    codes = BaseCLI.kickoff_jobs(module, cmds, config,
                                 job_tag=_cfg_tag(run_cfg))
    if any(codes):
        raise click.ClickException('Solar job failed')


@main.command()
@click.pass_context
def bias_calc(ctx):
    """Run bias calculations: config has a list of 'jobs' each with
    'bias_calc_class' + kwargs."""
    import sup3r_tpu.bias as bias_mod

    config = _get_config(ctx)
    status = Status(config['run_dir'])
    module = _status_module(ctx, 'bias-calc')
    for i, job in enumerate(config['jobs']):
        job = dict(job)
        cls_name = job.pop('bias_calc_class')
        fp_out = job.pop('fp_out', None)
        run_kwargs = job.pop('run_kwargs', {})
        cls = getattr(bias_mod, cls_name)
        status.update(module, f'bias_calc_{i}',
                      job_status='running')
        try:
            calc = cls(**job)
            calc.run(fp_out=fp_out, **run_kwargs)
            status.update(module, f'bias_calc_{i}',
                          job_status='successful')
        except Exception as e:
            status.update(module, f'bias_calc_{i}',
                          job_status='failed', error=str(e))
            raise


@main.command()
@click.pass_context
def data_collect(ctx):
    """Collect chunked output files into one file."""
    config = _get_config(ctx)
    run_cfg = {k: v for k, v in config.items()
               if k not in ('execution_control', 'run_dir')}
    module = _status_module(ctx, 'data-collect')
    cmds = [_node_cmd('data-collect', run_cfg, 0, config['run_dir'],
                      status_module=module)]
    codes = BaseCLI.kickoff_jobs(module, cmds, config,
                                 job_tag=_cfg_tag(run_cfg))
    if any(codes):
        raise click.ClickException('Collection failed')


@main.command()
@click.pass_context
def qa(ctx):
    """Run output QA from a config."""
    config = _get_config(ctx)
    run_cfg = {k: v for k, v in config.items()
               if k not in ('execution_control', 'run_dir')}
    module = _status_module(ctx, 'qa')
    cmds = [_node_cmd('qa', run_cfg, 0, config['run_dir'],
                      status_module=module)]
    codes = BaseCLI.kickoff_jobs(module, cmds, config,
                                 job_tag=_cfg_tag(run_cfg))
    if any(codes):
        raise click.ClickException('QA failed')


@main.command('import-model')
@click.argument('reference_dir', type=click.Path(exists=True))
@click.argument('out_dir', type=click.Path())
@click.option('--lr-shape', default=None,
              help='Comma-separated one-sample input shape, e.g. '
                   '"1,8,8,8,2" (inferred from the meta if omitted).')
def import_model(reference_dir, out_dir, lr_shape):
    """Convert a reference (NREL sup3r / phygnn TF) model checkpoint
    directory into a sup3r_tpu model directory usable by every
    forward-pass/pipeline command. Multi-step bundles (a directory of
    model_step_* / per-step subdirectories, as NREL releases them) are
    converted step by step into matching subdirectories."""
    from sup3r_tpu.utilities.port import load_reference_gan

    shape = (tuple(int(x) for x in lr_shape.split(','))
             if lr_shape else None)
    steps = sorted(
        d for d in os.listdir(reference_dir)
        if os.path.isfile(os.path.join(reference_dir, d,
                                       'model_params.json')))
    if steps and not os.path.isfile(
            os.path.join(reference_dir, 'model_params.json')):
        for step in steps:
            model = load_reference_gan(
                os.path.join(reference_dir, step), lr_shape=shape)
            model.save(os.path.join(out_dir, step))
            click.echo(f'Imported step {step} '
                       f'({model.s_enhance}x/{model.t_enhance}x)')
        click.echo(f'Imported {len(steps)}-step bundle '
                   f'{reference_dir} -> {out_dir}')
        return
    model = load_reference_gan(reference_dir, lr_shape=shape)
    model.save(out_dir)
    click.echo(f'Imported {reference_dir} -> {out_dir} '
               f'({model.s_enhance}x spatial / {model.t_enhance}x '
               'temporal)')


@main.command()
@click.option('--monitor', is_flag=True,
              help='Run all steps to completion in order.')
@click.option('--cancel', is_flag=True,
              help='scancel pending/running SLURM jobs of this '
                   'pipeline and mark them canceled.')
@click.option('--background', is_flag=True,
              help='Detach a `pipeline --monitor` process and return '
                   'immediately (reference: sup3r pipeline '
                   '--background); pid written to '
                   '.pipeline_monitor.pid in the run dir.')
@click.pass_context
def pipeline(ctx, monitor, cancel, background):
    """Run a multi-step pipeline config: {'pipeline': [{'forward-pass':
    'cfg.json'}, {'data-collect': 'cfg.json'}, ...]} — each step runs
    when its predecessor has succeeded (incremental restart via the
    status file)."""
    import subprocess
    import sys

    config = _get_config(ctx)
    run_dir = config['run_dir']
    status = Status(run_dir)

    def _parse_step(step):
        """(module, cfg_file) from either step spelling: the plain
        ``{module: cfg}`` form, or the reference's named form
        ``{'<any-name>': cfg, 'command': module}`` (reference:
        examples/sup3rcc/run_configs/solar/config_pipeline.json)."""
        step = dict(step)
        module = step.pop('command', None)
        (name, cfg_file), = step.items()
        return module or name, cfg_file

    # step identity = module + config hash: repeated modules (the
    # sup3rwind two-fwp chain), edited configs, and reordered steps
    # all resolve to the right skip/rerun behavior — identical
    # (module, config) pairs genuinely ARE the same work
    def _step_info(step):
        """(module, abs cfg path, status key, status dir). The status
        dir replicates what the invoked command's _get_config will
        compute (explicit 'run_dir' key, else the config's own
        directory) — the step's node jobs record status THERE, so the
        monitor must poll there too, not in the pipeline's run_dir."""
        module, cfg_file = _parse_step(step)
        fp = (cfg_file if os.path.isabs(cfg_file)
              else os.path.join(run_dir, cfg_file))
        fp = os.path.abspath(fp)
        try:
            step_cfg = load_config(fp)
            tag = _cfg_tag(step_cfg)
        except FileNotFoundError:
            step_cfg = {}
            tag = _cfg_tag({'file': cfg_file})
        step_dir = os.path.abspath(step_cfg.get('run_dir')
                                   or os.path.dirname(fp))
        return module, fp, f'{module}#{tag}', step_dir

    if background:
        cfg_fp = os.path.abspath(ctx.obj.get('CONFIG_FILE'))
        log_fp = os.path.join(run_dir, 'pipeline_monitor.log')
        with open(log_fp, 'a') as log:
            proc = subprocess.Popen(
                [sys.executable, '-m', 'sup3r_tpu.cli', '-c',
                 cfg_fp, 'pipeline', '--monitor'],
                stdout=log, stderr=log, start_new_session=True,
                cwd=run_dir)
        pid_fp = os.path.join(run_dir, '.pipeline_monitor.pid')
        with open(pid_fp, 'w') as f:
            f.write(str(proc.pid))
        logger.info('Detached pipeline monitor pid %d (log: %s)',
                    proc.pid, log_fp)
        return
    if cancel:
        # cancel every non-terminal job recorded for this project —
        # including step configs whose status lives in their own
        # directory (reference: gaps Pipeline.cancel_all)
        n = 0
        status_dirs = [run_dir]
        for step in config.get('pipeline', []):
            *_, step_dir = _step_info(step)
            if step_dir not in status_dirs:
                status_dirs.append(step_dir)
        for module, jobs, step_status in (
                (m, j, st) for st in map(Status, status_dirs)
                for m, j in st.read().items()):
            if module.startswith('__'):
                continue
            for job_name, job in jobs.items():
                if job.get('job_status') not in ('submitted',
                                                 'running'):
                    continue
                job_id = job.get('job_id')
                if job_id:
                    try:
                        res = subprocess.run(
                            ['scancel', str(job_id)],
                            capture_output=True, text=True, timeout=30)
                        if res.returncode != 0:
                            # the SLURM job may still be running —
                            # do NOT mark it canceled (a resubmit
                            # would double-write its chunks)
                            logger.error(
                                'scancel %s failed (rc=%s): %s — '
                                'leaving job status unchanged',
                                job_id, res.returncode,
                                res.stderr.strip()[-500:])
                            continue
                    except FileNotFoundError:
                        logger.warning('scancel not available; only '
                                       'marking job %s canceled',
                                       job_id)
                step_status.update(module, job_name,
                                   job_status='canceled')
                n += 1
        logger.info('Canceled %d pending/running job(s) across %s',
                    n, status_dirs)
        return
    steps = config['pipeline']
    commands = {
        'forward-pass': forward_pass,
        'solar': solar,
        'bias-calc': bias_calc,
        'data-collect': data_collect,
        'qa': qa,
    }
    poll_interval = float(config.get('poll_interval', 10))

    for step in steps:
        module, step_cfg_fp, skey, step_dir = _step_info(step)
        # the step command records its node jobs in ITS config's
        # run dir (see _get_config) — poll the same store, or steps
        # whose config lives in a subdirectory never look successful
        step_status = Status(step_dir)
        step_status.poll(skey)  # pick up finished SLURM jobs first
        if step_status.module_successful(skey):
            logger.info('Pipeline step "%s" already successful.',
                        skey)
            continue
        logger.info('Running pipeline step "%s"', skey)
        # retry failed jobs of this step
        step_status.clear_failed(skey)
        step_ctx = click.Context(commands[module],
                                 obj={'STATUS_MODULE': skey,
                                      'CONFIG_FILE': step_cfg_fp})
        try:
            with step_ctx:
                commands[module].invoke(step_ctx)
        except Exception as e:
            # setup failures (bad config, missing model dir) happen
            # before any node job records status — record them so
            # `.status.json` always explains why the pipeline stopped
            step_status.update(skey, f'{skey}_setup',
                               job_status='failed',
                               stderr=str(e)[-2000:])
            raise click.ClickException(
                f'Pipeline step "{skey}" failed during setup: '
                f'{e}') from e
        if not monitor:
            break
        # SLURM steps return after sbatch; poll until terminal so the
        # next step only starts on success (reference: gaps Pipeline
        # monitoring, sup3r/utilities/cli.py:214-267)
        while True:
            step_status.poll(skey)
            if step_status.module_successful(skey):
                break
            if step_status.module_failed(skey):
                raise click.ClickException(
                    f'Pipeline step "{skey}" failed; see '
                    f'{step_status.fp}')
            pending = any(
                j.get('job_status') in ('submitted', 'running')
                for j in step_status.read().get(skey, {}).values())
            if not pending:
                raise click.ClickException(
                    f'Pipeline step "{skey}" did not complete; see '
                    f'{step_status.fp}')
            time.sleep(poll_interval)


def _batch_dirs(config):
    """Existing batch_* project directories for a batch config."""
    run_dir = config['run_dir']
    dirs = []
    for batch_set in config['sets']:
        args = batch_set['args']
        keys = list(args)
        for combo in itertools.product(*[args[k] for k in keys]):
            tag = '_'.join(f'{k}_{v}' for k, v in zip(keys, combo))
            dirs.append(os.path.join(run_dir, f'batch_{tag}'))
    return dirs


@main.command()
@click.option('--dry-run', is_flag=True,
              help='Only create the batch project directories.')
@click.option('--cancel', is_flag=True,
              help='Cancel pending/running jobs of every batch '
                   'sub-pipeline (reference: gaps BatchJob cancel).')
@click.option('--delete', is_flag=True,
              help='Delete all batch job sub-directories created '
                   'from this config (reference: gaps BatchJob '
                   'delete).')
@click.pass_context
def batch(ctx, dry_run, cancel, delete):
    """Permutation batching: config has 'sets' of [{'args': {k:
    [v1, v2]}, 'files': [...]}] expanded into per-permutation project
    directories (reference: gaps BatchJob semantics)."""
    config = _get_config(ctx)
    run_dir = config['run_dir']
    if cancel or delete:
        import shutil

        for job_dir in _batch_dirs(config):
            if not os.path.isdir(job_dir):
                continue
            if cancel:
                pipeline_fp = os.path.join(job_dir,
                                           'config_pipeline.json')
                if os.path.exists(pipeline_fp):
                    step_ctx = click.Context(
                        pipeline, obj={'CONFIG_FILE': pipeline_fp})
                    step_ctx.params = {'monitor': False,
                                       'cancel': True,
                                       'background': False}
                    with step_ctx:
                        pipeline.invoke(step_ctx)
            if delete:
                shutil.rmtree(job_dir)
                logger.info('Deleted batch dir %s', job_dir)
        return
    for batch_set in config['sets']:
        args = batch_set['args']
        files = batch_set['files']
        keys = list(args)
        for combo in itertools.product(*[args[k] for k in keys]):
            tag = '_'.join(f'{k}_{v}' for k, v in zip(keys, combo))
            job_dir = os.path.join(run_dir, f'batch_{tag}')
            os.makedirs(job_dir, exist_ok=True)
            for fp in files:
                src = (fp if os.path.isabs(fp)
                       else os.path.join(run_dir, fp))
                with open(src) as f:
                    cfg = json.load(f)
                # only replace keys the config actually has (gaps
                # BatchJob semantics) — a fwp-only arg must not leak
                # into the collect config as an unexpected kwarg
                cfg.update({k: v for k, v in zip(keys, combo)
                            if k in cfg})
                with open(os.path.join(job_dir,
                                       os.path.basename(fp)),
                          'w') as f:
                    json.dump(cfg, f, indent=2)
            logger.info('Created batch dir %s', job_dir)
            if not dry_run:
                pipeline_fp = os.path.join(job_dir,
                                           'config_pipeline.json')
                if os.path.exists(pipeline_fp):
                    step_ctx = click.Context(
                        pipeline, obj={'CONFIG_FILE': pipeline_fp})
                    step_ctx.params = {'monitor': True,
                                       'cancel': False,
                                       'background': False}
                    with step_ctx:
                        pipeline.invoke(step_ctx)


if __name__ == '__main__':
    main(obj={})
