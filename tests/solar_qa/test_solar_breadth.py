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

    # sequential day-long chunks (reference fake chunk files carry
    # distinct consecutive times, helpers.py make_fake_cs_ratio_files)
    for t, t_id in enumerate(('000000', '000001', '000002')):
        _make_fake_cs_ratio_file(
            str(tmp_path / f'sup3r_chunk_{t_id}_000000.h5'),
            (5, 5, 24), start=f'2050-06-0{1 + t}')
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


def test_positive_tz_backfills_tail(tmp_path):
    """Eastern-hemisphere tz>0: np.roll wraps the first local hours to
    the END of the series; the wrapped tail must be backfilled from
    the nearest valid row, mirroring the tz<0 head backfill (round-4
    review finding)."""
    gan_fp = _make_fake_cs_ratio_file(
        str(tmp_path / 'sup3r_chunk_000000_000000.h5'), (5, 5, 24))
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48))
    with h5py.File(gan_fp, 'a') as f:
        csr = f['clearsky_ratio']
        data = csr[...].astype(np.float64)
        # stamp a recognizable ramp so wrapped rows are detectable
        # (the dataset is stored as scaled int — write STORAGE values)
        sf = csr.attrs.get('scale_factor', 1.0)
        data[:] = np.linspace(0.1, 0.9, data.shape[0])[:, None] * sf
        csr[...] = data.astype(csr.dtype)
    with Solar(gan_fp, nsrdb_fp, tz=3) as s:
        out = s.clearsky_ratio
        # the wrapped tail rows must equal the last valid row, not
        # the series head
        np.testing.assert_allclose(out[-3], out[-4], atol=1e-6)
        np.testing.assert_allclose(out[-2], out[-4], atol=1e-6)
        np.testing.assert_allclose(out[-1], out[-4], atol=1e-6)
    with Solar(gan_fp, nsrdb_fp, tz=-3) as s:
        out = s.clearsky_ratio
        np.testing.assert_allclose(out[0], out[3], atol=1e-6)
        np.testing.assert_allclose(out[2], out[3], atol=1e-6)


def test_written_dni_carries_dhi_closure(tmp_path):
    """write() stores the closure-corrected dni: the file must satisfy
    ghi = dhi + dni*cos(sza) wherever dhi was clamped to 0 (the
    reference writes the UNCORRECTED dni first, solar.py:537-559 —
    intentional fix, see Solar.write docstring)."""
    gan_fp = _make_fake_cs_ratio_file(
        str(tmp_path / 'sup3r_chunk_000000_000000.h5'), (5, 5, 24))
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48))
    out_fp = str(tmp_path / 'out_irradiance.h5')
    with Solar(gan_fp, nsrdb_fp, tz=-6) as solar:
        solar.write(out_fp)
        sza = solar.solar_zenith_angle
        corrected_dni = solar.dni  # after dhi closure (cached)
    with h5py.File(out_fp) as f:
        dni = f['dni'][...] / f['dni'].attrs['scale_factor']
        dhi = f['dhi'][...] / f['dhi'].attrs['scale_factor']
        ghi = f['ghi'][...] / f['ghi'].attrs['scale_factor']
    np.testing.assert_allclose(dni, corrected_dni, atol=1.0)
    day = sza < 85
    closure = ghi - (dhi + dni * np.cos(np.radians(sza)))
    assert np.abs(closure[day]).max() < 2.0, (
        'written file violates ghi = dhi + dni*cos(sza)')


def test_fps_grouping_tolerates_trailing_tags(tmp_path):
    """get_sup3r_fps parses chunk ids with the collectors' anchored
    regex, so filenames the collectors accept group identically here
    (round-4 review finding: a second split('_') parser diverged)."""
    from sup3r_tpu.solar.solar import Solar as S

    for t in range(3):
        fp = tmp_path / f'sup3r_chunk_{t:06d}_000000.h5'
        fp.write_bytes(b'x')
    fps, t_slices, t_ids, s_ids, targets = S.get_sup3r_fps(
        str(tmp_path / 'sup3r_chunk_*.h5'))
    assert len(fps) == 3
    assert [len(s) for s in fps] == [2, 3, 2]
    assert all(os.path.exists(f) for fs in fps for f in fs)


def test_explicit_temporal_ids_still_split_across_nodes(tmp_path):
    """An explicit temporal_ids list restricts the chunk universe but
    must STILL split over max_nodes — otherwise every node processes
    (and double-writes) every listed chunk (round-5 review finding).
    Integer JSON-config ids normalize to the zero-padded string ids
    encoded in chunk file names."""
    for t, t_id in enumerate(('000000', '000001', '000002')):
        _make_fake_cs_ratio_file(
            str(tmp_path / f'sup3r_chunk_{t_id}_000000.h5'),
            (5, 5, 24), start=f'2050-06-0{1 + t}')
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48 * 3))
    pattern = str(tmp_path / 'sup3r_chunk_*.h5')
    # integer ids (the natural JSON spelling) select chunks 0 and 2
    written = []
    for node in range(2):
        written += Solar.run_temporal_chunks(
            pattern, nsrdb_fp, tz=-6, temporal_ids=[0, 2],
            max_nodes=2, node_index=node)
    assert len(written) == 2
    assert len(set(written)) == 2
    assert not any('000001' in fp for fp in written)
    # rerun skips existing outputs — no node double-writes
    rerun = []
    for node in range(2):
        rerun += Solar.run_temporal_chunks(
            pattern, nsrdb_fp, tz=-6, temporal_ids=[0, 2],
            max_nodes=2, node_index=node)
    assert rerun == []
