"""init_multihost argument plumbing + validation (SURVEY §2.7
multi-node scale-out; can't run a real DCN group in tests, so the
initialize call is intercepted)."""

import jax
import pytest

from sup3r_tpu.parallel.mesh import get_mesh, init_multihost


def test_explicit_args_are_plumbed(monkeypatch):
    calls = {}

    def fake_init(**kwargs):
        calls.update(kwargs)

    monkeypatch.setattr(jax.distributed, 'initialize', fake_init)
    monkeypatch.setattr(jax, 'process_index', lambda: 2)
    monkeypatch.setattr(jax, 'process_count', lambda: 4)
    idx, count = init_multihost('10.0.0.1:1234', num_processes=4,
                                process_id=2,
                                local_device_ids=[0, 1])
    assert (idx, count) == (2, 4)
    assert calls == {'coordinator_address': '10.0.0.1:1234',
                     'num_processes': 4, 'process_id': 2,
                     'local_device_ids': [0, 1]}


def test_validation_errors(monkeypatch):
    monkeypatch.setattr(jax.distributed, 'initialize',
                        lambda **k: None)
    with pytest.raises(ValueError, match='requires num_processes'):
        init_multihost('10.0.0.1:1234')
    with pytest.raises(ValueError, match='outside'):
        init_multihost('10.0.0.1:1234', num_processes=4, process_id=4)
    with pytest.raises(ValueError, match='must be >= 1'):
        init_multihost('10.0.0.1:1234', num_processes=0, process_id=0)


def test_already_initialized_is_reused(monkeypatch):
    def raise_already(**kwargs):
        raise RuntimeError('Distributed system is already initialized')

    monkeypatch.setattr(jax.distributed, 'initialize', raise_already)
    monkeypatch.setattr(jax, 'process_index', lambda: 0)
    monkeypatch.setattr(jax, 'process_count', lambda: 1)
    idx, count = init_multihost('10.0.0.1:1234', num_processes=1,
                                process_id=0)
    assert (idx, count) == (0, 1)


def test_other_runtime_errors_propagate(monkeypatch):
    def raise_other(**kwargs):
        raise RuntimeError('coordination service unreachable')

    monkeypatch.setattr(jax.distributed, 'initialize', raise_other)
    with pytest.raises(RuntimeError, match='unreachable'):
        init_multihost('10.0.0.1:1234', num_processes=2, process_id=0)


def test_get_mesh_raises_on_too_few_devices():
    with pytest.raises(ValueError, match='requested a 999-device'):
        get_mesh(999)
    mesh = get_mesh(4)
    assert mesh.devices.size == 4
