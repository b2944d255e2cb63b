"""CollectorH5 scale machinery: threaded reads, write-group planning,
target-meta threshold masking, duplicate-chunk dedup, and per-file
scale-factor harmonization (mirrors reference
tests/output/test_output_handling.py collection cases and
sup3r/postprocessing/collectors/h5.py:83-833 behavior)."""

import os
import shutil

import h5py
import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.postprocessing.collectors import (
    CollectorH5,
    get_chunk_indices,
    get_unique_chunk_files,
)
from sup3r_tpu.postprocessing.writers import OutputHandlerH5
from sup3r_tpu.utilities import RANDOM_GENERATOR


def _grid(s1, s2, lat0=40.0, lat1=39.0, lon0=-105.0, lon1=-104.0):
    lat = np.linspace(lat0, lat1, s1)
    lon = np.linspace(lon0, lon1, s2)
    return np.dstack(np.meshgrid(lat, lon, indexing='ij'))


def _write_chunks(tmp_path, s1=8, s2=8, t=8, feature='windspeed_100m',
                  prefix='chunk'):
    """4 spatial x 2 temporal chunk files; returns (files, truth (t,
    gid) array, lat_lon, times, gids)."""
    data = (RANDOM_GENERATOR.random((s1, s2, t, 1)) * 10).astype(
        np.float32)
    lat_lon = _grid(s1, s2)
    times = pd.date_range('2023-01-01', periods=t, freq='h')
    gids = np.arange(s1 * s2).reshape(s1, s2)
    h = s1 // 2
    chunks = []
    for t_idx, t_slice in enumerate([slice(0, t // 2),
                                     slice(t // 2, t)]):
        for s_idx, (ss1, ss2) in enumerate(
                [(slice(0, h), slice(0, h)), (slice(0, h), slice(h, s2)),
                 (slice(h, s1), slice(0, h)),
                 (slice(h, s1), slice(h, s2))]):
            fp = str(tmp_path / f'{prefix}_{t_idx:06d}_{s_idx:06d}.h5')
            OutputHandlerH5._write_output(
                data[ss1, ss2, t_slice].copy(), [feature],
                lat_lon[ss1, ss2], times[t_slice], fp,
                gids=gids[ss1, ss2])
            chunks.append(fp)
    truth = data[..., 0].reshape(s1 * s2, t).T
    return chunks, truth, lat_lon, times, gids


def _read_scaled(fp, feature='windspeed_100m'):
    with h5py.File(fp, 'r') as f:
        return (f[feature][:] / f[feature].attrs['scale_factor'],
                f['meta'][:])


def test_threaded_reads_match_serial(tmp_path):
    """max_workers=1 (serial) and max_workers=4 (thread pool) produce
    identical collections."""
    chunks, truth, *_ = _write_chunks(tmp_path)
    out1 = str(tmp_path / 'serial.h5')
    out4 = str(tmp_path / 'threaded.h5')
    CollectorH5.collect(chunks, out1, max_workers=1)
    CollectorH5.collect(chunks, out4, max_workers=4, n_writes=2)
    ws1, meta1 = _read_scaled(out1)
    ws4, meta4 = _read_scaled(out4)
    np.testing.assert_array_equal(ws1, ws4)
    np.testing.assert_array_equal(meta1, meta4)
    np.testing.assert_allclose(ws1, truth, atol=0.01)


def test_flist_chunk_planning(tmp_path):
    """Write groups respect n_writes, clamp to the temporal chunk
    count, and cover every file exactly once."""
    chunks, *_ = _write_chunks(tmp_path)  # 2 temporal chunks, 8 files
    coll = CollectorH5(chunks)
    # default: one write group PER temporal chunk (memory = one
    # temporal chunk's slab); explicit n_writes merges groups
    assert len(coll.get_flist_chunks(None)) == 2
    assert len(coll.get_flist_chunks(1)) == 1
    assert len(coll.get_flist_chunks(2)) == 2
    # n_writes > temporal chunks clamps to 2 groups
    groups = coll.get_flist_chunks(10)
    assert len(groups) == 2
    flat = [fp for g in groups for fp in g]
    assert sorted(flat) == sorted(chunks)
    # each group holds exactly one temporal chunk's files
    for g in groups:
        assert len({get_chunk_indices(fp)[0] for fp in g}) == 1


def test_target_meta_masking(tmp_path):
    """Collection masked to a target meta keeps only coordinates
    within threshold and still collects their data correctly."""
    chunks, truth, lat_lon, _, gids = _write_chunks(tmp_path)
    flat_lat = lat_lon[..., 0].ravel()
    flat_lon = lat_lon[..., 1].ravel()
    keep = np.arange(0, len(flat_lat), 3)
    target = pd.DataFrame({'latitude': flat_lat[keep],
                           'longitude': flat_lon[keep]})
    tm = str(tmp_path / 'target.csv')
    target.to_csv(tm, index=False)
    out = str(tmp_path / 'masked.h5')
    CollectorH5.collect(chunks, out, target_meta_file=tm)
    ws, meta = _read_scaled(out)
    assert len(meta) == len(keep)
    np.testing.assert_array_equal(np.sort(meta['gid']), np.sort(keep))
    order = np.argsort(meta['gid'])
    np.testing.assert_allclose(ws[:, order], truth[:, np.sort(keep)],
                               atol=0.01)


def test_target_meta_no_match_raises(tmp_path):
    """Targets outside the threshold of every collected coordinate
    fail loudly instead of writing an empty file."""
    chunks, *_ = _write_chunks(tmp_path)
    target = pd.DataFrame({'latitude': [10.0], 'longitude': [50.0]})
    tm = str(tmp_path / 'far.csv')
    target.to_csv(tm, index=False)
    with pytest.raises(RuntimeError, match='No target coordinates'):
        CollectorH5.collect(chunks, str(tmp_path / 'x.h5'),
                            target_meta_file=tm)


def test_chunk_outside_target_warns_and_skips(tmp_path):
    """A chunk file contributing no target coordinates warns and is
    skipped; the others still collect (reference:
    collectors/h5.py:178-186)."""
    chunks, truth, lat_lon, _, gids = _write_chunks(tmp_path)
    # target = only the first spatial quadrant's coords
    quad = gids[:4, :4].ravel()
    target = pd.DataFrame({
        'latitude': lat_lon[..., 0].ravel()[quad],
        'longitude': lat_lon[..., 1].ravel()[quad]})
    tm = str(tmp_path / 'quad.csv')
    target.to_csv(tm, index=False)
    out = str(tmp_path / 'quad.h5')
    with pytest.warns(UserWarning, match='No target coordinates'):
        CollectorH5.collect(chunks, out, target_meta_file=tm,
                            max_workers=1)
    ws, meta = _read_scaled(out)
    assert len(meta) == len(quad)
    order = np.argsort(meta['gid'])
    np.testing.assert_allclose(ws[:, order], truth[:, np.sort(quad)],
                               atol=0.01)


def test_duplicate_chunk_files_deduped(tmp_path):
    """Two files carrying the same chunk id collapse to one
    (reference: collectors/h5.py:235-264)."""
    chunks, truth, *_ = _write_chunks(tmp_path)
    dup = str(tmp_path / 'dupjob_000000_000000.h5')
    shutil.copy(chunks[0], dup)
    unique = get_unique_chunk_files([dup, *chunks])
    assert len(unique) == len(chunks)
    out = str(tmp_path / 'dedup.h5')
    CollectorH5.collect([dup, *chunks], out)
    ws, _ = _read_scaled(out)
    np.testing.assert_allclose(ws, truth, atol=0.01)


def test_scale_factor_harmonization(tmp_path):
    """A chunk file written at a different scale_factor than the
    destination attrs is rescaled on collection (reference:
    collectors/h5.py:106-200)."""
    chunks, truth, *_ = _write_chunks(tmp_path)
    # rewrite the first chunk at scale_factor 10 (dest attrs use 100)
    fp = chunks[0]
    with h5py.File(fp, 'r+') as f:
        raw = f[fp and 'windspeed_100m'][:]
        scale = f['windspeed_100m'].attrs['scale_factor']
        vals = raw.astype(np.float32) / scale
        del f['windspeed_100m']
        ds = f.create_dataset(
            'windspeed_100m',
            data=np.round(vals * 10.0).astype(raw.dtype))
        ds.attrs['scale_factor'] = 10.0
    out = str(tmp_path / 'rescaled.h5')
    CollectorH5.collect(chunks, out, max_workers=1)
    ws, _ = _read_scaled(out)
    # coarser source quantization (0.1) -> atol 0.06
    np.testing.assert_allclose(ws, truth, atol=0.06)


def test_features_subset_and_bad_ids(tmp_path):
    """Explicit feature list collects only those datasets; malformed
    chunk file names are rejected."""
    chunks, *_ = _write_chunks(tmp_path)
    out = str(tmp_path / 'subset.h5')
    CollectorH5.collect(chunks, out, features=['windspeed_100m'])
    with h5py.File(out, 'r') as f:
        assert set(f) == {'meta', 'time_index', 'windspeed_100m'}
    with pytest.raises(ValueError, match='chunk ids'):
        get_chunk_indices('not_a_chunk_file.h5')


def test_collect_overwrite_false_skips(tmp_path):
    """overwrite=False leaves an existing collected file untouched
    (reference: collectors/h5.py overwrite option)."""
    import os

    fps, *_ = _write_chunks(tmp_path)
    out = str(tmp_path / 'collected.h5')
    CollectorH5.collect(fps, out)
    mtime = os.path.getmtime(out)
    CollectorH5.collect(fps, out, overwrite=False)
    assert os.path.getmtime(out) == mtime
    CollectorH5.collect(fps, out, overwrite=True)
