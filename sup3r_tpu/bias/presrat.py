"""PresRat bias calibration: QDM + zero-precipitation-rate preservation
+ K-factor mean-trend preservation [Pierce2015].

Reference parity: sup3r/bias/presrat.py:33-494, mixins.py:105
(ZeroRateMixin).
"""

import logging

import numpy as np

from sup3r_tpu.bias.qdm import QuantileDeltaMappingCorrection
from sup3r_tpu.bias.qdm_math import QuantileDeltaMapping
from sup3r_tpu.bias.transforms import window_mask

logger = logging.getLogger(__name__)


def zero_precipitation_rate(arr, threshold=0.0):
    """Fraction of finite values below ``threshold`` (reference:
    mixins.py:119)."""
    finite = np.asarray(arr)[np.isfinite(arr)]
    if finite.size == 0:
        return np.nan
    return float((finite < threshold).sum() / finite.size)


class PresRat(QuantileDeltaMappingCorrection):
    """QDM + tau (dry-day preservation) + K factors."""

    def __init__(self, *args, zero_rate_threshold=1.157e-7, **kwargs):
        super().__init__(*args, **kwargs)
        self.zero_rate_threshold = zero_rate_threshold

    def _correct_fut(self, bias_data, fut_data, base_data, bias_ti,
                     fut_ti, base_ti):
        """Windowed relative QDM correction of the future data (used to
        derive tau and K)."""
        corrected = np.full_like(fut_data, np.nan, dtype=np.float32)
        for d0 in self.time_window_center:
            base_idx = window_mask(base_ti.dayofyear, d0,
                                   self.window_size)
            bias_idx = window_mask(bias_ti.dayofyear, d0,
                                   self.window_size)
            fut_idx = window_mask(fut_ti.dayofyear, d0,
                                  self.window_size)
            if not (base_idx.any() and bias_idx.any()
                    and fut_idx.any()):
                continue
            params = self.get_qdm_params(
                bias_data[bias_idx], fut_data[fut_idx],
                base_data[base_idx])
            qdm = QuantileDeltaMapping(
                params_oh=params[
                    f'base_{self.base_dset}_params'][None],
                params_mh=params[
                    f'bias_{self.bias_feature}_params'][None],
                params_mf=params[
                    f'bias_fut_{self.bias_feature}_params'][None],
                relative=self.relative, sampling=self.sampling,
                log_base=self.log_base,
                delta_denom_min=self.zero_rate_threshold)
            corrected[fut_idx] = qdm(
                fut_data[fut_idx][:, None])[:, 0]
        return corrected

    @classmethod
    def calc_tau_fut(cls, base_data, bias_data, bias_fut_data,
                     corrected_fut_data, zero_rate_threshold=1.157e-7):
        """Threshold preserving the model-predicted dry-day fraction
        (reference: presrat.py:96)."""
        obs_zero_rate = zero_precipitation_rate(base_data,
                                                zero_rate_threshold)
        n_threshold = round(obs_zero_rate * bias_data.size)
        n_threshold = min(n_threshold, bias_data.size - 1)
        tau = np.sort(bias_data)[n_threshold]
        z_fg = float((bias_fut_data < tau).sum() / bias_fut_data.size)
        idx = min(round(z_fg * corrected_fut_data.size),
                  corrected_fut_data.size - 1)
        tau_fut = np.sort(corrected_fut_data)[idx]
        return tau_fut, obs_zero_rate

    def calc_k_factor(self, base_data, bias_data, bias_fut_data,
                      corrected_fut_data, base_ti, bias_ti,
                      bias_fut_ti):
        """Per-window K preserving the model's mean change:
        K = (<mf>/<mh>) / (<qdm(mf)>/<oh>) (reference:
        presrat.py:253, Pierce 2015 eq. 7)."""
        k = np.full(self.n_time_steps, np.nan, np.float32)
        for nt, d0 in enumerate(self.time_window_center):
            base_idx = window_mask(base_ti.dayofyear, d0,
                                   self.window_size)
            bias_idx = window_mask(bias_ti.dayofyear, d0,
                                   self.window_size)
            fut_idx = window_mask(bias_fut_ti.dayofyear, d0,
                                  self.window_size)
            if not (base_idx.any() and bias_idx.any()
                    and fut_idx.any()):
                continue
            mean_oh = np.nanmean(base_data[base_idx])
            mean_mh = np.nanmean(bias_data[bias_idx])
            mean_mf = np.nanmean(bias_fut_data[fut_idx])
            mean_corr = np.nanmean(corrected_fut_data[fut_idx])
            denom = mean_corr * mean_mh
            if denom and np.isfinite(denom):
                k[nt] = (mean_mf * mean_oh) / denom
        return k

    def _init_out(self):
        out = super()._init_out()
        shape2 = (*self.bias_gid_raster.shape, 1)
        out[f'{self.bias_feature}_tau_fut'] = np.full(shape2, np.nan,
                                                      np.float32)
        out[f'{self.bias_feature}_k_factor'] = np.full(
            (*self.bias_gid_raster.shape, self.n_time_steps), np.nan,
            np.float32)
        out[f'{self.bias_feature}_zero_rate'] = np.full(shape2, np.nan,
                                                        np.float32)
        return out

    def run(self, fp_out=None, max_workers=1, daily_reduction='avg',
            fill_extend=True, smooth_extend=0, smooth_interior=0):
        out = self._init_out()

        def one_gid(bias_gid):
            base_data, base_ti = self.get_base_data(
                bias_gid, daily_reduction=daily_reduction)
            if base_data is None:
                return bias_gid, None
            bias_data = self.get_bias_data(bias_gid)
            fut_data = self.get_bias_fut_data(bias_gid)
            bias_ti = self.bias_time_index
            fut_ti = self.bias_fut_dh.time_index
            single = self._windowed_params(
                bias_data, fut_data, base_data, bias_ti, fut_ti,
                base_ti)
            corrected = self._correct_fut(
                bias_data, fut_data, base_data, bias_ti, fut_ti,
                base_ti)
            valid = np.isfinite(corrected)
            tau_fut, zero_rate = self.calc_tau_fut(
                base_data, bias_data, fut_data[valid],
                corrected[valid], self.zero_rate_threshold)
            k = self.calc_k_factor(base_data, bias_data, fut_data,
                                   corrected, base_ti, bias_ti, fut_ti)
            return bias_gid, (single, tau_fut, zero_rate, k)

        from sup3r_tpu.bias.qdm import _run_gid_loop

        results = _run_gid_loop(one_gid, self.bias_gid_raster.size,
                                max_workers)
        for bias_gid, res in results:
            if res is None:
                continue
            single, tau_fut, zero_rate, k = res
            row, col = np.unravel_index(bias_gid,
                                        self.bias_gid_raster.shape)
            for key, v in single.items():
                out[key][row, col] = v
            out[f'{self.bias_feature}_tau_fut'][row, col, 0] = tau_fut
            out[f'{self.bias_feature}_k_factor'][row, col] = k
            out[f'{self.bias_feature}_zero_rate'][row, col, 0] = \
                zero_rate
        flat = {k: v.reshape(*v.shape[:2], -1) for k, v in out.items()}
        flat = self.fill_and_smooth(flat, fill_extend, smooth_extend,
                                    smooth_interior)
        for k in out:
            out[k] = flat[k].reshape(out[k].shape)
        if fp_out is not None:
            self.write_outputs(fp_out, out, extra_attrs={
                'zero_rate_threshold': self.zero_rate_threshold})
        return out
