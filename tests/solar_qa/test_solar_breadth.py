"""Solar module breadth (mirrors reference
tests/forward_pass/test_solar_module.py): nn_threshold out-of-bounds
zeroing, agg_factor neighbor averaging, tz roll behavior, cloudy-vs-
clear DNI switching, and the ignore filter in chunk grouping."""

import os

import h5py
import numpy as np
import pytest

from sup3r_tpu.solar import Solar
from tests.solar_qa.test_solar_qa import (
    _make_fake_cs_ratio_file,
    _make_fake_nsrdb,
)


def test_out_of_bounds_sites_zeroed(tmp_path):
    """GAN sites farther than nn_threshold from every NSRDB site get
    zero irradiance (reference: solar.py out_of_bounds)."""
    gan_fp = _make_fake_cs_ratio_file(
        str(tmp_path / 'sup3r_chunk_000000_000000.h5'), (5, 5, 24))
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48))
    with Solar(gan_fp, nsrdb_fp, tz=-6, nn_threshold=1e-6) as solar:
        assert solar.out_of_bounds.all()
        assert (solar.ghi == 0).all()
        assert (solar.dni == 0).all()
        assert (solar.dhi == 0).all()


def test_agg_factor_averages_neighbors(tmp_path):
    """agg_factor=4 averages 4 NSRDB neighbors; values differ from
    the 1-neighbor case but stay in range."""
    gan_fp = _make_fake_cs_ratio_file(
        str(tmp_path / 'sup3r_chunk_000000_000000.h5'), (5, 5, 24))
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48))
    with Solar(gan_fp, nsrdb_fp, tz=-6) as s1:
        g1 = s1.ghi.copy()
    with Solar(gan_fp, nsrdb_fp, tz=-6, agg_factor=4) as s4:
        assert s4.idnn.shape[1] == 4
        g4 = s4.ghi.copy()
    assert g1.shape == g4.shape
    assert not np.allclose(g1, g4)
    assert g4.min() >= 0


def test_tz_roll_moves_daylight(tmp_path):
    """The csr roll converts local-time GAN output to the NSRDB UTC
    frame: tz=-6 vs tz=0 produce time-shifted csr."""
    gan_fp = _make_fake_cs_ratio_file(
        str(tmp_path / 'sup3r_chunk_000000_000000.h5'), (5, 5, 24))
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48))
    with Solar(gan_fp, nsrdb_fp, tz=0) as s0:
        csr0 = s0.clearsky_ratio.copy()
    with Solar(gan_fp, nsrdb_fp, tz=-6) as s6:
        csr6 = s6.clearsky_ratio.copy()
    # rows 6.. of tz=-6 match rows 0.. shifted (roll by +6)
    np.testing.assert_allclose(csr6[10:], csr0[4:-6], atol=1e-6)


def test_cloudy_dni_below_clearsky(tmp_path):
    """Where the GAN csr says cloudy, DNI must not exceed clearsky
    DNI; where clear, DNI equals clearsky DNI (away from night)."""
    gan_fp = _make_fake_cs_ratio_file(
        str(tmp_path / 'sup3r_chunk_000000_000000.h5'), (5, 5, 24))
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48))
    with Solar(gan_fp, nsrdb_fp, tz=-6) as solar:
        cs_dni = solar.get_nsrdb_data('clearsky_dni')
        dni = solar.dni
        assert (dni <= cs_dni + 1e-3).all()
        clear = ~solar.cloud_mask
        day = solar.solar_zenith_angle < 85
        sel = clear & day & ~np.broadcast_to(
            solar.out_of_bounds, dni.shape)
        if sel.any():
            np.testing.assert_allclose(dni[sel], cs_dni[sel],
                                       rtol=1e-5)


def test_fps_grouping_ignore_filter(tmp_path):
    for t in range(2):
        _make_fake_cs_ratio_file(
            str(tmp_path / f'sup3r_chunk_{t:06d}_000000.h5'),
            (3, 3, 24))
    _make_fake_cs_ratio_file(
        str(tmp_path / 'sup3r_chunk_000000_000000_irradiance.h5'),
        (3, 3, 24))
    fp_sets, *_ = Solar.get_sup3r_fps(
        str(tmp_path / 'sup3r_chunk_*.h5'), ignore='_irradiance')
    flat = {fp for fps in fp_sets for fp in fps}
    assert not any('_irradiance' in fp for fp in flat)


def test_written_file_round_trips_scaled(tmp_path):
    gan_fp = _make_fake_cs_ratio_file(
        str(tmp_path / 'sup3r_chunk_000000_000000.h5'), (4, 4, 24))
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (8, 8, 48))
    fp_out = str(tmp_path / 'irr.h5')
    with Solar(gan_fp, nsrdb_fp, tz=-6) as solar:
        ghi = solar.ghi.copy()
        solar.write(fp_out)
    with h5py.File(fp_out, 'r') as f:
        scale = f['ghi'].attrs['scale_factor']
        back = f['ghi'][:] / scale
        assert len(f['meta']) == 16
    np.testing.assert_allclose(back, ghi, atol=1.0 / scale + 0.01)


def test_run_temporal_chunks_multi_node(tmp_path):
    """max_nodes>1 splits temporal chunks across node_index values —
    every chunk is written by exactly one node, surplus nodes no-op
    (round-3 review finding: the single-node CLI silently dropped
    all but split 0)."""
    from tests.solar_qa.test_solar_qa import (
        _make_fake_cs_ratio_file,
        _make_fake_nsrdb,
    )

    for t_id in ('000000', '000001', '000002'):
        _make_fake_cs_ratio_file(
            str(tmp_path / f'sup3r_chunk_{t_id}_000000.h5'),
            (5, 5, 24), start='2050-06-01')
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48 * 3))
    pattern = str(tmp_path / 'sup3r_chunk_*.h5')
    written = []
    for node in range(4):  # one more node than chunks
        written += Solar.run_temporal_chunks(
            pattern, nsrdb_fp, tz=-6, max_nodes=4, node_index=node)
    assert len(written) == 3
    assert len(set(written)) == 3
    for fp in written:
        assert os.path.exists(fp)
