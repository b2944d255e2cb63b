"""Boundary-adjusted final chunks (slicer min-width adjustment) must
write shape-consistent output.

The reference's ``check_boundary_slice`` keeps the PADDED-slice extent
when ``spatial_pad > 0`` (slicer.py:583-585: ``slice(half*e, -half*e)``
over data padded to pad_slice + 2*half) while ``hr_lat_lon``/``gids``
span only the raw chunk extent (strategy.py:573-577) — a latent
reference inconsistency that crashes the writer for any grid where
``2*spatial_pad + grid % fwp_chunk_shape < min_width``. Our slicer
stays bit-parity on the reference-faithful properties
(tests/pipeline/test_slicer.py) and the strategy composes the
corrected ``hr_crop_slices_exact`` into chunks instead
(slicer._exact_boundary_crops)."""

import glob
import os

import h5py
import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.pipeline.slicer import ForwardPassSlicer
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file

FEATURES = ['u_100m', 'v_100m']


def _save_model(tmp_path, s_enhance=1):
    gen = [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 1,
         'strides': 1},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': 2,
         'spatial_mult': s_enhance, 'temporal_method': 'nearest'},
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 1,
         'strides': 1},
    ]
    disc = [{'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(
        lr_features=FEATURES, hr_out_features=FEATURES,
        s_enhance=s_enhance, t_enhance=2,
        input_resolution={'spatial': '12km', 'temporal': '60min'})
    model.set_norm_stats({f: 0.0 for f in FEATURES},
                         {f: 1.0 for f in FEATURES})
    model.init_weights((1, 6, 6, 4, 2),
                       (1, 6 * s_enhance, 6 * s_enhance, 8, 2))
    out_dir = os.path.join(tmp_path, 'model')
    model.save(out_dir)
    return out_dir


def test_exact_crops_match_raw_extent():
    """Each corrected crop keeps exactly the chunk's raw width, for
    every chunk incl. the boundary-adjusted final one."""
    import warnings

    for coarse, chunk, pad, enh in [
            ((12, 12), (8, 8, 4), 1, 1),
            ((8, 8), (7, 7, 4), 1, 3),
            ((8, 8), (7, 7, 4), 0, 1),
            ((10, 10), (4, 4, 4), 2, 2)]:  # last: no adjustment
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            sl = ForwardPassSlicer(
                coarse_shape=coarse, time_steps=8, s_enhance=enh,
                t_enhance=2, time_slice=slice(None), temporal_pad=1,
                spatial_pad=pad, chunk_shape=chunk)
            for dim, (lr_sl, pad_sl, crops) in enumerate([
                    (sl.s1_lr_slices, sl.s1_lr_pad_slices,
                     sl._exact_boundary_crops(
                         sl.s1_lr_slices, sl.s1_lr_pad_slices,
                         sl.s1_hr_crop_slices, 0))]):
                for us, ps, cs in zip(lr_sl, pad_sl, crops):
                    pw = sl._get_pad_width(
                        us, coarse[dim], pad,
                        min_width=sl.min_width[dim],
                        check_boundary=True)
                    padded_w = ((ps.stop - ps.start) + pw[0]
                                + pw[1]) * enh
                    kept = len(np.arange(padded_w)[cs])
                    assert kept == (us.stop - us.start) * enh, (
                        coarse, chunk, pad, enh, us, ps, cs)


def test_exact_crops_fuzz_full_tiling():
    """Arithmetic fuzz: across random (grid, chunk, pad, enh) configs
    the exact crops map every chunk's kept HR region onto EXACTLY its
    raw hr placement slice — the written chunks tile the grid with no
    overlap or hole, including all boundary-adjusted cases."""
    import warnings

    rng = np.random.default_rng(7)
    for _ in range(200):
        n = int(rng.integers(5, 40))
        c = int(rng.integers(2, n + 3))
        pad = int(rng.integers(0, 4))
        enh = int(rng.choice([1, 2, 3, 5]))
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            sl = ForwardPassSlicer(
                coarse_shape=(n, n), time_steps=8, s_enhance=enh,
                t_enhance=1, time_slice=slice(None), temporal_pad=0,
                spatial_pad=pad, chunk_shape=(c, c, 8))
            for dim, (lr_sl, pad_sl, hr_sl, crops) in enumerate([
                (sl.s1_lr_slices, sl.s1_lr_pad_slices,
                 sl.s1_hr_slices,
                 sl._exact_boundary_crops(
                     sl.s1_lr_slices, sl.s1_lr_pad_slices,
                     sl.s1_hr_crop_slices, 0)),
                (sl.s2_lr_slices, sl.s2_lr_pad_slices,
                 sl.s2_hr_slices,
                 sl._exact_boundary_crops(
                     sl.s2_lr_slices, sl.s2_lr_pad_slices,
                     sl.s2_hr_crop_slices, 1)),
            ]):
                covered = []
                for us, ps, hs, cs in zip(lr_sl, pad_sl, hr_sl,
                                          crops):
                    pw = sl._get_pad_width(
                        us, n, pad, min_width=sl.min_width[dim],
                        check_boundary=True)
                    # absolute HR coordinates of the padded block
                    lo = (ps.start - pw[0]) * enh
                    hi = (ps.stop + pw[1]) * enh
                    kept = np.arange(lo, hi)[cs]
                    assert kept[0] == hs.start and \
                        kept[-1] + 1 == hs.stop, (
                            n, c, pad, enh, dim, us, ps, cs)
                    covered.extend(kept.tolist())
                assert covered == list(range(n * enh)), (n, c, pad,
                                                         enh, dim)


@pytest.mark.parametrize('pack', [None, False])
def test_boundary_chunk_fwp_writes_complete_grid(tmp_path, pack):
    """Grid 12 with chunk 8 / pad 1 triggers the min-width adjustment
    on the final chunks; the chunked forward pass must write every
    HR site exactly once with per-file data matching its own meta —
    on both the device-packed and host drain paths."""
    model_dir = _save_model(str(tmp_path))
    input_file = make_fake_nc_file(
        str(tmp_path / 'in.nc'), (12, 12, 8), ['u100', 'v100'])
    out_dir = str(tmp_path / 'out')
    with pytest.warns(UserWarning, match='too small'):
        strategy = ForwardPassStrategy(
            file_paths=input_file,
            model_kwargs={'model_dir': model_dir},
            fwp_chunk_shape=(8, 8, 4), spatial_pad=1, temporal_pad=1,
            out_pattern=out_dir + '/chunk_{file_id}.h5',
            pass_workers=1, pack_output_on_device=pack)
        ForwardPass.run(strategy, 0)
    files = sorted(glob.glob(out_dir + '/*.h5'))
    assert len(files) == 8  # 2x2 spatial x 2 temporal
    seen = {}
    for fp in files:
        with h5py.File(fp) as fh:
            n_sites = fh['meta'].shape[0]
            lat = fh['meta']['latitude']
            lon = fh['meta']['longitude']
            times = fh['time_index'][:]
            for k in ('windspeed_100m', 'winddirection_100m'):
                arr = fh[k][:]
                assert arr.shape == (len(times), n_sites), (fp, k)
                assert np.isfinite(arr).all()
            for t in times:
                for la, lo in zip(lat, lon):
                    key = (t, round(float(la), 4), round(float(lo), 4))
                    assert key not in seen, (fp, seen[key], key)
                    seen[key] = fp
    # every HR (time, site) written exactly once: full tiling
    assert len(seen) == 12 * 12 * 16
