"""Quantile Delta Mapping factor calculation: windowed empirical CDFs
for observed-historical / modeled-historical / modeled-future data.

Reference parity: sup3r/bias/qdm.py:50-583.
"""

import logging

import numpy as np

from sup3r_tpu.bias.base import DataRetrievalBase
from sup3r_tpu.bias.bias_calc import FillAndSmoothMixin
from sup3r_tpu.bias.qdm_math import sampled_quantiles
from sup3r_tpu.preprocessing.data_handlers import get_input_handler_class

logger = logging.getLogger(__name__)


def _run_gid_loop(fn, n_gids, max_workers):
    """Run per-gid stat computation serially or across threads (the
    reference fans out with ProcessPoolExecutor, bias_calc.py:191-255;
    the work here is GIL-releasing numpy reductions so threads are the
    cheaper equivalent)."""
    if max_workers == 1:
        return map(fn, range(n_gids))
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(fn, range(n_gids)))


def window_center(ntimes):
    """ntimes equally spaced days-of-year, shifted half an interval
    (reference: qdm.py:273)."""
    assert ntimes > 0
    dt = 365 / ntimes
    return np.arange(dt / 2, 366, dt)


class QuantileDeltaMappingCorrection(FillAndSmoothMixin,
                                     DataRetrievalBase):
    """Estimate empirical CDF parameter rasters for QDM."""

    def __init__(self, base_fps, bias_fps, bias_fut_fps, base_dset,
                 bias_feature, distance_upper_bound=None, target=None,
                 shape=None, base_handler='LoaderH5',
                 bias_handler='DataHandler', base_handler_kwargs=None,
                 bias_handler_kwargs=None,
                 bias_fut_handler_kwargs=None, decimals=None,
                 match_zero_rate=False, n_quantiles=101,
                 dist='empirical', relative=True, sampling='linear',
                 log_base=10, n_time_steps=24, window_size=None):
        super().__init__(
            base_fps, bias_fps, base_dset, bias_feature, target=target,
            shape=shape, base_handler=base_handler,
            bias_handler=bias_handler,
            base_handler_kwargs=base_handler_kwargs,
            bias_handler_kwargs=bias_handler_kwargs, decimals=decimals,
            match_zero_rate=match_zero_rate,
            distance_upper_bound=distance_upper_bound)
        HandlerClass = (get_input_handler_class(bias_handler)
                        if isinstance(bias_handler, str)
                        else bias_handler)
        self.bias_fut_dh = HandlerClass(
            bias_fut_fps, features=[bias_feature], target=target,
            shape=shape, **(bias_fut_handler_kwargs
                            or bias_handler_kwargs or {}))
        self.n_quantiles = n_quantiles
        self.dist = dist
        self.relative = relative
        self.sampling = sampling
        self.log_base = log_base
        self.n_time_steps = n_time_steps
        self.window_size = window_size or 365 / n_time_steps
        self.time_window_center = window_center(n_time_steps)

    def get_bias_fut_data(self, bias_gid):
        """(t,) future biased series for one grid cell."""
        row, col = np.unravel_index(bias_gid,
                                    self.bias_gid_raster.shape)
        out = self.bias_fut_dh.data[self.bias_feature][row, col]
        if self.decimals is not None:
            out = np.round(out, self.decimals)
        return np.asarray(out)

    def get_qdm_params(self, bias_data, bias_fut_data, base_data):
        """Empirical CDF x-values at the sampled quantiles."""
        quantiles = sampled_quantiles(self.n_quantiles, self.sampling,
                                      self.log_base) * 100
        return {
            f'base_{self.base_dset}_params': np.nanpercentile(
                base_data, quantiles),
            f'bias_{self.bias_feature}_params': np.nanpercentile(
                bias_data, quantiles),
            f'bias_fut_{self.bias_feature}_params': np.nanpercentile(
                bias_fut_data, quantiles),
        }

    def _init_out(self):
        keys = [f'base_{self.base_dset}_params',
                f'bias_{self.bias_feature}_params',
                f'bias_fut_{self.bias_feature}_params']
        shape = (*self.bias_gid_raster.shape, self.n_time_steps,
                 self.n_quantiles)
        return {k: np.full(shape, np.nan, np.float32) for k in keys}

    def _windowed_params(self, bias_data, bias_fut_data, base_data,
                         bias_ti, bias_fut_ti, base_ti):
        """Per-window parameter rows for one gid: (NT, n_quantiles)."""
        from sup3r_tpu.bias.transforms import window_mask

        out = {}
        for nt, d0 in enumerate(self.time_window_center):
            base_idx = window_mask(base_ti.dayofyear, d0,
                                   self.window_size)
            bias_idx = window_mask(bias_ti.dayofyear, d0,
                                   self.window_size)
            fut_idx = window_mask(bias_fut_ti.dayofyear, d0,
                                  self.window_size)
            if base_idx.any() and bias_idx.any() and fut_idx.any():
                params = self.get_qdm_params(
                    bias_data[bias_idx], bias_fut_data[fut_idx],
                    base_data[base_idx])
                for k, v in params.items():
                    out.setdefault(k, np.full(
                        (self.n_time_steps, self.n_quantiles), np.nan,
                        np.float32))[nt] = v
        return out

    def _window_index_matrix(self, ti):
        """(NT, L) time-index matrix + validity mask padding each
        day-of-year window to the longest window's length (static
        shapes, so the device path compiles ONE program)."""
        from sup3r_tpu.bias.transforms import window_mask

        masks = [window_mask(ti.dayofyear, d0, self.window_size)
                 for d0 in self.time_window_center]
        length = max((int(m.sum()) for m in masks), default=0)
        length = max(length, 1)
        idx = np.zeros((len(masks), length), dtype=np.int64)
        valid = np.zeros((len(masks), length), dtype=bool)
        for i, m in enumerate(masks):
            w = np.flatnonzero(m)
            idx[i, :len(w)] = w
            valid[i, :len(w)] = True
        return idx, valid

    def _windowed_params_raster(self, arr, ti, use_device=False):
        """Windowed CDF params for ALL gids at once: (s1, s2, NT, NQ).

        Replaces the reference's per-gid ProcessPoolExecutor fan-out
        (reference: bias_calc.py:191-255) with a batched percentile
        over the full raster — the SURVEY §2.7 'vmap over gid batches
        on device' design. ``use_device=True`` pads every day-of-year
        window to a static length and evaluates one jitted
        ``jnp.nanpercentile`` dispatch; the host path loops windows
        with numpy on the same float32 inputs the per-gid path used,
        so it matches that math exactly (the device path differs at
        fp32 interpolation tolerance)."""
        quantiles = sampled_quantiles(self.n_quantiles, self.sampling,
                                      self.log_base) * 100
        arr = np.asarray(arr, dtype=np.float32)
        if self.decimals is not None:
            arr = np.round(arr, self.decimals)
        s1, s2 = arr.shape[:2]
        out = np.full((s1, s2, self.n_time_steps, self.n_quantiles),
                      np.nan, np.float32)
        idx, valid = self._window_index_matrix(ti)
        if use_device:
            import jax
            import jax.numpy as jnp

            @jax.jit
            def _pcts(vals, valid):
                vals = jnp.where(valid[None, None], vals, jnp.nan)
                # (NQ, s1, s2, NT) percentiles over the window axis
                return jnp.nanpercentile(vals, jnp.asarray(
                    quantiles, dtype=jnp.float32), axis=-1)

            vals = arr[:, :, idx]              # (s1, s2, NT, L)
            res = np.asarray(_pcts(jax.device_put(vals),
                                   jax.device_put(valid)))
            out = np.transpose(res, (1, 2, 3, 0)).astype(np.float32)
            out[:, :, ~valid.any(axis=1), :] = np.nan
            return out
        for nt in range(self.n_time_steps):
            w = idx[nt][valid[nt]]
            if not len(w):
                continue
            # vectorized over every gid in one percentile call
            res = np.nanpercentile(arr[:, :, w], quantiles, axis=-1)
            out[:, :, nt, :] = np.transpose(res, (1, 2, 0))
        return out

    @staticmethod
    def _resolve_use_device(use_device):
        """``use_device=None`` auto-enables the device path when an
        accelerator backs jax (TPU here; the host path is the right
        default on CPU where numpy float64 is both exact and fast)."""
        if use_device is not None:
            return bool(use_device)
        try:
            import jax

            return jax.default_backend() not in ('cpu',)
        except Exception:  # pragma: no cover - jax always importable
            return False

    def run(self, fp_out=None, max_workers=1, daily_reduction='avg',
            fill_extend=True, smooth_extend=0, smooth_interior=0,
            use_device=None):
        """Compute QDM parameter rasters for every gid; write to H5.

        The bias / bias_fut windowed CDFs are computed for all gids in
        batched percentile calls (``use_device=True`` runs them as one
        jitted dispatch on the accelerator; ``None`` auto-enables that
        on TPU); only the baseline series — irregular per-gid neighbor
        aggregations — runs in the threaded gid loop (reference:
        bias_calc.py:191-255)."""
        use_device = self._resolve_use_device(use_device)
        from sup3r_tpu.bias.transforms import window_mask

        out = self._init_out()
        quantiles = sampled_quantiles(self.n_quantiles, self.sampling,
                                      self.log_base) * 100
        base_tis = {}

        def one_gid(bias_gid):
            base_data, base_ti = self.get_base_data(
                bias_gid, daily_reduction=daily_reduction)
            if base_data is None:
                return bias_gid, None, None
            rows = np.full((self.n_time_steps, self.n_quantiles),
                           np.nan, np.float32)
            for nt, d0 in enumerate(self.time_window_center):
                mask = window_mask(base_ti.dayofyear, d0,
                                   self.window_size)
                if mask.any():
                    rows[nt] = np.nanpercentile(base_data[mask],
                                                quantiles)
            return bias_gid, rows, base_ti

        base_key = f'base_{self.base_dset}_params'
        valid_gids = np.zeros(self.bias_gid_raster.size, dtype=bool)
        results = _run_gid_loop(one_gid, self.bias_gid_raster.size,
                                max_workers)
        for bias_gid, rows, base_ti in results:
            if rows is None:
                continue
            valid_gids[bias_gid] = True
            base_tis.setdefault('ti', base_ti)
            row, col = np.unravel_index(bias_gid,
                                        self.bias_gid_raster.shape)
            out[base_key][row, col] = rows

        bias_key = f'bias_{self.bias_feature}_params'
        fut_key = f'bias_fut_{self.bias_feature}_params'
        out[bias_key] = self._windowed_params_raster(
            self.bias_dh.data[self.bias_feature],
            self.bias_time_index, use_device=use_device)
        out[fut_key] = self._windowed_params_raster(
            self.bias_fut_dh.data[self.bias_feature],
            self.bias_fut_dh.time_index, use_device=use_device)
        # reference semantics (qdm.py:415-430): a window's params only
        # exist when base AND bias AND fut all have samples in it
        if 'ti' in base_tis:
            window_ok = np.array([
                window_mask(base_tis['ti'].dayofyear, d0,
                            self.window_size).any()
                and window_mask(self.bias_time_index.dayofyear, d0,
                                self.window_size).any()
                and window_mask(self.bias_fut_dh.time_index.dayofyear,
                                d0, self.window_size).any()
                for d0 in self.time_window_center])
            for k in (base_key, bias_key, fut_key):
                out[k][:, :, ~window_ok, :] = np.nan
        # gids with no mapped baseline stay NaN everywhere (matching
        # the per-gid reference behavior) and are later filled/smoothed
        invalid = ~valid_gids.reshape(self.bias_gid_raster.shape)
        out[bias_key][invalid] = np.nan
        out[fut_key][invalid] = np.nan
        # fill/smooth over the leading spatial dims of 4D param arrays
        flat = {k: v.reshape(*v.shape[:2], -1) for k, v in out.items()}
        flat = self.fill_and_smooth(flat, fill_extend, smooth_extend,
                                    smooth_interior)
        out = {k: v.reshape(*v.shape[:2], self.n_time_steps,
                            self.n_quantiles)
               for k, v in flat.items()}
        if fp_out is not None:
            self.write_outputs(fp_out, out)
        return out

    def write_outputs(self, fp_out, out, extra_attrs=None):
        """Write parameter rasters + QDM config attrs."""
        from sup3r_tpu.bias.bias_calc import LinearCorrection

        attrs = {
            'time_window_center': self.time_window_center.tolist(),
            'sampling': self.sampling,
            'log_base': self.log_base,
            'n_quantiles': self.n_quantiles,
            'dist': self.dist,
            'relative': self.relative,
        }
        attrs.update(extra_attrs or {})
        LinearCorrection.write_outputs(self, fp_out, out,
                                       extra_attrs=attrs)
