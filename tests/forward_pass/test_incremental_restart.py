"""Incremental restart + chunk redistribution depth (mirrors
reference tests/forward_pass/test_forward_pass.py incremental cases
and strategy.py:364/667 semantics)."""

import os

import numpy as np
import pytest

from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from tests.forward_pass.test_forward_pass import (
    _s_gen_config,
    _save_model,
)


@pytest.fixture
def setup(tmp_path):
    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'),
                                   (10, 10, 4), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _s_gen_config(), 2, 1,
                               is_5d=False)
    out_pattern = str(tmp_path / 'out' / 'chunk_{file_id}.h5')

    def build(**kwargs):
        return ForwardPassStrategy(
            file_paths=input_file, model_class='Sup3rGan',
            model_kwargs={'model_dir': model_dir},
            fwp_chunk_shape=(5, 5, 4), spatial_pad=1, temporal_pad=0,
            out_pattern=out_pattern, **kwargs)

    return tmp_path, build


def test_incremental_regenerates_only_missing(setup):
    """Deleting one chunk file and re-running touches ONLY that
    chunk; the other outputs keep their bytes."""
    tmp_path, build = setup
    s1 = build()
    ForwardPass.run(s1, 0)
    files = sorted((tmp_path / 'out').iterdir())
    assert len(files) == 4
    before = {f.name: f.read_bytes() for f in files}
    victim = files[1]
    os.remove(victim)

    s2 = build()
    assert [s2.chunk_finished(i, log=False) for i in range(4)] == [
        True, False, True, True]
    ForwardPass.run(s2, 0)
    after = sorted((tmp_path / 'out').iterdir())
    assert len(after) == 4
    for f in after:
        if f.name == victim.name:
            continue
        assert f.read_bytes() == before[f.name], f.name


def test_redistribute_chunks_balances_remaining(setup):
    """redistribute_chunks=True splits only UNFINISHED chunks over
    nodes, so a resume with max_nodes=2 gives each node half the
    remaining work instead of skipping finished chunks at runtime."""
    tmp_path, build = setup
    s1 = build()
    ForwardPass.run(s1, 0)
    # remove two outputs
    files = sorted((tmp_path / 'out').iterdir())
    os.remove(files[0])
    os.remove(files[3])

    s2 = build(max_nodes=2, redistribute_chunks=True)
    node_chunks = [list(c) for c in s2.node_chunks]
    assert len(node_chunks) == 2
    flat = sorted(i for c in node_chunks for i in c)
    assert flat == [0, 3]
    assert all(len(c) == 1 for c in node_chunks)

    # without redistribution, nodes keep their original static split
    s3 = build(max_nodes=2, redistribute_chunks=False)
    flat3 = sorted(i for c in s3.node_chunks for i in c)
    assert flat3 == [0, 1, 2, 3]


def test_non_incremental_overwrites(setup):
    """incremental=False re-runs every chunk even when outputs
    exist."""
    tmp_path, build = setup
    s1 = build()
    ForwardPass.run(s1, 0)
    s2 = build(incremental=False)
    assert not any(s2.chunk_finished(i, log=False) for i in range(4))


def test_head_node_skips_exo_preflight(tmp_path):
    """head_node=True plans node_chunks without rasterizing exo data
    (reference: strategy.py head_node semantics)."""
    from sup3r_tpu.utilities.test_helpers import make_fake_h5_file
    from tests.forward_pass.test_exo_chains import _topo_spatial_gan

    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'),
                                   (8, 8, 4), ['u100', 'v100'])
    topo_file = make_fake_h5_file(
        str(tmp_path / 'topo.h5'), (40, 40, 2), ['windspeed_10m'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1))
    mdir = _topo_spatial_gan(tmp_path, 'm', ['u_100m', 'v_100m'])
    kwargs = dict(
        file_paths=input_file, model_class='Sup3rGan',
        model_kwargs={'model_dir': mdir},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'topography': {
            'source_file': topo_file,
            'cache_dir': str(tmp_path / 'exo')}},
        out_pattern=None)
    head = ForwardPassStrategy(**kwargs, head_node=True)
    assert head.exo_data is None
    assert not (tmp_path / 'exo').exists(), \
        'head node must not rasterize exo data'
    assert len(head.node_chunks) >= 1
    worker = ForwardPassStrategy(**kwargs)
    assert worker.exo_data is not None
