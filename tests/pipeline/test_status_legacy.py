"""Back-compat of the .status.json jobstore: stores written by older
key formats (round-1 ``module``/``module_{i}``, repeated-module
``module-{idx}``) must still skip previously-successful jobs, matching
the reference's gaps Status stability (reference:
sup3r/utilities/cli.py:214-267). New (versioned) stores keep the
strict config-hash isolation."""

import json
import os

from sup3r_tpu.utilities.cli import (
    STATUS_FILE,
    STATUS_VERSION,
    BaseCLI,
    Status,
)


def _write_raw(run_dir, payload):
    with open(os.path.join(str(run_dir), STATUS_FILE), 'w') as f:
        json.dump(payload, f)


def test_round1_format_skips(tmp_path):
    """Bare-module keys with ``module_{i}`` job names resolve against
    current hashed keys."""
    _write_raw(tmp_path, {
        'forward-pass': {
            'forward-pass_0': {'job_status': 'successful'},
            'forward-pass_1': {'job_status': 'successful'},
        },
    })
    st = Status(str(tmp_path))
    assert st.module_successful('forward-pass#ab12cd')
    assert st.job_status(
        'forward-pass#ab12cd', 'forward-pass#ab12cd_9f3e21_0'
    ) == 'successful'
    assert st.job_status(
        'forward-pass#ab12cd', 'forward-pass#ab12cd_9f3e21_1'
    ) == 'successful'
    # a node index the old run never recorded is NOT successful
    assert st.job_status(
        'forward-pass#ab12cd', 'forward-pass#ab12cd_9f3e21_2') is None
    # unrelated module unaffected
    assert not st.module_successful('data-collect#ab12cd')


def test_indexed_format_is_ambiguous(tmp_path):
    """Repeated-module ``module-{idx}`` keys (early round-2) are
    AMBIGUOUS against the current hashed step keys — a success under
    one alias cannot be attributed to a specific step, so the lookup
    refuses (re-running is safe; silently skipping a step that never
    ran is not)."""
    _write_raw(tmp_path, {
        'forward-pass-0': {
            'forward-pass-0_0': {'job_status': 'successful'}},
        'forward-pass-1': {
            'forward-pass-1_0': {'job_status': 'successful'}},
    })
    st = Status(str(tmp_path))
    assert not st.module_successful('forward-pass#aaaaaa')
    assert st.job_status(
        'forward-pass#aaaaaa', 'forward-pass#aaaaaa_bbbbbb_0') is None
    # a SINGLE indexed alias resolves fine
    _write_raw(tmp_path, {
        'forward-pass-1': {
            'forward-pass-1_0': {'job_status': 'successful'}},
    })
    assert st.module_successful('forward-pass#aaaaaa')


def test_versioned_store_keeps_isolation(tmp_path):
    """A version-stamped store never falls back to bare-module keys:
    two different configs sharing a run_dir must not skip each other."""
    _write_raw(tmp_path, {
        '__version__': STATUS_VERSION,
        'forward-pass': {
            'forward-pass_0': {'job_status': 'successful'}},
    })
    st = Status(str(tmp_path))
    assert not st.module_successful('forward-pass#ab12cd')
    assert st.job_status(
        'forward-pass#ab12cd', 'forward-pass#ab12cd_x_0') is None
    # the exact legacy key still reads directly
    assert st.module_successful('forward-pass')


def test_run_local_skips_on_legacy_record(tmp_path):
    """BaseCLI.run_local short-circuits on a legacy successful job —
    the command is not re-run (rc 0, no new failure record)."""
    _write_raw(tmp_path, {
        'forward-pass': {
            'forward-pass_0': {'job_status': 'successful'}},
    })
    rc = BaseCLI.run_local('false', 'forward-pass#ab12cd',
                           'forward-pass#ab12cd_9f3e21_0',
                           str(tmp_path))
    assert rc == 0
    # the store was not rewritten with a failure
    assert Status(str(tmp_path)).job_status(
        'forward-pass#ab12cd', 'forward-pass#ab12cd_9f3e21_0'
    ) == 'successful'


def test_update_stamps_version_and_poll_ignores_it(tmp_path):
    """Writes stamp __version__; poll() and cancel-listing skip it."""
    st = Status(str(tmp_path))
    st.update('forward-pass#ab', 'forward-pass#ab_x_0',
              job_status='successful')
    raw = st.read()
    assert raw['__version__'] == STATUS_VERSION
    # poll over all modules must not trip on the version key
    st.poll(squeue_fn=lambda j: None, sacct_fn=lambda j: None)
    # legacy store + a later update(): legacy keys remain readable
    _write_raw(tmp_path, {
        'solar': {'solar_0': {'job_status': 'successful'}}})
    st.update('qa#ff', 'qa#ff_x_0', job_status='running')
    assert st.module_successful('solar#abcdef')


def test_poll_transitions_legacy_jobs(tmp_path):
    """poll(current-key) also transitions jobs recorded under the
    legacy spelling — otherwise an upgraded pipeline double-submits
    on top of still-running SLURM jobs (round-3 review finding)."""
    exit_fp = str(tmp_path / '.fwd.exit')
    with open(exit_fp, 'w') as f:
        f.write('0')
    _write_raw(tmp_path, {
        'forward-pass': {
            'forward-pass_0': {'job_status': 'submitted',
                               'exit_file': exit_fp}},
    })
    st = Status(str(tmp_path))
    st.poll('forward-pass#ab12cd',
            squeue_fn=lambda j: None, sacct_fn=lambda j: None)
    assert st.job_status('forward-pass#ab12cd',
                         'forward-pass#ab12cd_x_0') == 'successful'
    assert st.module_successful('forward-pass#ab12cd')
