"""Runtime-transform coverage regressions from the round-4 review:
nearest-window assignment covers EVERY day of year (reference
bias_transforms.py:788-791), PresRat's no_trend skips tau/K
(reference :1117-1120), non-finite outputs raise (reference
:816-825/:1128-1135), and drop_leap date-range kwargs interoperate
(reference preprocessing/utilities.py:173-245)."""

import json

import h5py
import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.bias import local_presrat_bc, local_qdm_bc
from sup3r_tpu.bias.qdm_math import sampled_quantiles
from sup3r_tpu.bias.transforms import (
    get_date_range_kwargs,
    make_time_index_from_kws,
)

RNG = np.random.default_rng(7)
S = 4
NQ = 11


def _factor_file(fp, n_windows, with_presrat=False, k=1.5, tau=0.0,
                 mh_zero=False):
    """+2 offset correction (oh = mh - 2) over n_windows day-of-year
    windows centered per the reference window_center formula."""
    lat = np.linspace(40.0, 39.0, S)[:, None].repeat(S, axis=1)
    lon = np.linspace(-105.5, -104.3, S)[None].repeat(S, axis=0)
    q = sampled_quantiles(NQ) * 100
    base_row = np.nanpercentile(RNG.normal(10, 2, 4000), q)
    mh = np.broadcast_to(base_row + 2,
                         (S, S, n_windows, NQ)).astype(np.float32)
    if mh_zero:
        mh = np.zeros_like(mh)
    oh = np.broadcast_to(base_row,
                         (S, S, n_windows, NQ)).astype(np.float32)
    centers = (365 / n_windows) * (0.5 + np.arange(n_windows))
    with h5py.File(fp, 'w') as f:
        f.create_dataset('latitude', data=lat)
        f.create_dataset('longitude', data=lon)
        f.create_dataset('base_ws_params', data=oh)
        f.create_dataset('bias_u_100m_params', data=mh)
        f.create_dataset('bias_fut_u_100m_params', data=mh.copy())
        if with_presrat:
            f.create_dataset('u_100m_tau_fut',
                             data=np.full((S, S, 1), tau, np.float32))
            f.create_dataset('u_100m_k_factor',
                             data=np.full((S, S, n_windows), k,
                                          np.float32))
        f.attrs['cfg'] = json.dumps({
            'time_window_center': centers.tolist(),
            'sampling': 'linear', 'log_base': 10})
    return str(fp)


def _grid():
    lat = np.linspace(40.0, 39.0, S)
    lon = np.linspace(-105.5, -104.3, S)
    return np.dstack(np.meshgrid(lat, lon, indexing='ij'))


@pytest.mark.parametrize('n_windows', [2, 5, 24, 73])
def test_qdm_covers_every_day_of_year(tmp_path, n_windows):
    """A full leap-year daily series must come back fully corrected —
    strict window masks left doy 365/366 (and every 5th day for some
    window counts) as NaN."""
    fp = _factor_file(tmp_path / 'bc.h5', n_windows)
    ti = pd.date_range('2020-01-01', '2020-12-31', freq='D')  # 366 d
    data = np.full((S, S, ti.size), 10.0, np.float32)
    out = local_qdm_bc(data, _grid(), 'ws', 'u_100m', fp,
                       get_date_range_kwargs(ti))
    assert np.isfinite(out).all(), (
        f'NaN days with {n_windows} windows: '
        f'{np.where(np.isnan(out[0, 0]))[0]}')
    np.testing.assert_allclose(out, data - 2, atol=1e-4)


def test_presrat_no_trend_skips_tau_and_k(tmp_path):
    """no_trend=True limits PresRat to QDM only: no zero-rate tau, no
    K factor (reference bias_transforms.py:1117-1120)."""
    fp = _factor_file(tmp_path / 'bc.h5', 2, with_presrat=True,
                      k=1.5, tau=50.0)
    ti = pd.date_range('2015-01-01', '2015-12-31', freq='D')
    data = np.full((S, S, ti.size), 10.0, np.float32)
    kws = get_date_range_kwargs(ti)
    qdm_only = local_qdm_bc(data, _grid(), 'ws', 'u_100m', fp,
                            kws, no_trend=True)
    out = local_presrat_bc(data, _grid(), 'ws', 'u_100m', fp, kws,
                           no_trend=True)
    # tau=50 would zero EVERYTHING and k=1.5 would scale; under
    # no_trend the output must be exactly the QDM-only correction
    np.testing.assert_array_equal(out, qdm_only)
    assert (out != 0).all()
    # ... and with no_trend=False both tau and k apply
    out_trend = local_presrat_bc(data, _grid(), 'ws', 'u_100m', fp,
                                 kws, no_trend=False)
    assert (out_trend == 0).all()  # everything under tau=50


def test_qdm_nonfinite_output_raises(tmp_path):
    """Relative QDM with all-zero model-hist params -> inf deltas must
    raise, not silently propagate (reference :816-825)."""
    fp = _factor_file(tmp_path / 'bc.h5', 2, mh_zero=True)
    ti = pd.date_range('2015-01-01', '2015-03-01', freq='D')
    data = np.full((S, S, ti.size), 10.0, np.float32)
    with pytest.raises(RuntimeError, match='non-finite'):
        local_qdm_bc(data, _grid(), 'ws', 'u_100m', fp,
                     get_date_range_kwargs(ti), relative=True)


def test_date_range_kwargs_drop_leap_roundtrip():
    """Noleap-calendar daily data spanning a leap year round-trips
    through get_date_range_kwargs/make_time_index_from_kws via the
    reference's drop_leap kwarg; the kwargs dict is never mutated."""
    full = pd.date_range('2016-01-01', '2016-12-31', freq='D')
    noleap = full[~((full.month == 2) & (full.day == 29))]
    assert len(noleap) == 365
    kws = get_date_range_kwargs(noleap)
    assert kws.get('drop_leap') is True
    rebuilt = make_time_index_from_kws(kws)
    assert rebuilt.equals(noleap)
    # not mutated: a second rebuild from the SAME dict still works
    assert make_time_index_from_kws(kws).equals(noleap)
    # regular indices stay regular (no drop_leap key)
    hourly = pd.date_range('2016-02-28', periods=72, freq='h')
    kws2 = get_date_range_kwargs(hourly)
    assert 'drop_leap' not in kws2
    assert make_time_index_from_kws(kws2).equals(hourly)
    # inconsistent frequencies whose nominal rebuild is NOT longer
    # (so not the noleap signature) fail loudly, as in the reference
    ragged = pd.DatetimeIndex([
        '2016-01-01', '2016-01-02', '2016-01-03',
        '2016-01-03 12:00', '2016-01-04 12:00'])
    with pytest.raises(ValueError, match='consistent frequency'):
        get_date_range_kwargs(ragged)
    # a DATA GAP also makes the nominal rebuild longer than the index
    # — it must NOT be mislabeled a noleap calendar (which silently
    # shifted every downstream day-of-year window; review finding)
    hourly_year = pd.date_range('2015-01-01', '2015-12-31 23:00',
                                freq='h')
    gap = hourly_year[~((hourly_year.month == 6)
                        & (hourly_year.day == 15))]
    with pytest.raises(ValueError, match='consistent frequency'):
        get_date_range_kwargs(gap)
    # ... including a gap that happens to span a leap year
    full_leap = pd.date_range('2016-01-01', '2016-12-31', freq='D')
    gap_leap = full_leap[~((full_leap.month == 7)
                           & (full_leap.day == 4))]
    with pytest.raises(ValueError, match='consistent frequency'):
        get_date_range_kwargs(gap_leap)
