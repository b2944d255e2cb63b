"""SurfaceSpatialMetModel: physics-based (non-NN) spatial downscaler for
near-surface temperature / relative humidity / pressure.

Reference parity: sup3r/models/surface.py:27-827 (temperature lapse
rate, RH linear regression on delta-T/delta-topo, barometric pressure
scaling, LANCZOS interpolation with low-res-consistency bias fix).
"""

import json
import logging
import os
from inspect import signature

import numpy as np
from PIL import Image

from sup3r_tpu.models.abstract import AbstractInterface
from sup3r_tpu.names import parse_feature
from sup3r_tpu.ops import spatial_coarsening
from sup3r_tpu.utilities import RANDOM_GENERATOR

logger = logging.getLogger(__name__)


class SurfaceSpatialMetModel(AbstractInterface):
    """Physics downscaler for temperature_*m / relativehumidity_*m /
    pressure_*m (other features get plain interpolation)."""

    #: temperature lapse rate (deg C/K per meter)
    TEMP_LAPSE = 6.5 / 1000
    #: pressure scale-height divisor: 101325*(1-(1-topo/DIV)**EXP)
    PRES_DIV = 44307.69231
    PRES_EXP = 5.25328
    #: RH regression weights on (delta_temp, delta_topo)
    W_DELTA_TEMP = -3.99242830
    W_DELTA_TOPO = -0.01736911

    def __init__(self, lr_features, s_enhance, noise_adders=None,
                 temp_lapse=None, w_delta_temp=None, w_delta_topo=None,
                 pres_div=None, pres_exp=None, interp_method='LANCZOS',
                 input_resolution=None, fix_bias=True):
        self._lr_features = [f.lower() for f in lr_features]
        self._s_enhance = s_enhance
        self._noise_adders = noise_adders
        self._temp_lapse = temp_lapse or self.TEMP_LAPSE
        self._w_delta_temp = w_delta_temp or self.W_DELTA_TEMP
        self._w_delta_topo = w_delta_topo or self.W_DELTA_TOPO
        self._pres_div = pres_div or self.PRES_DIV
        self._pres_exp = pres_exp or self.PRES_EXP
        self._fix_bias = fix_bias
        self._interp_name = interp_method
        self._interp_method = getattr(Image.Resampling, interp_method)
        self._input_resolution = input_resolution
        if isinstance(noise_adders, (int, float)):
            self._noise_adders = [noise_adders] * len(lr_features)

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, model_dir, verbose=False):
        """Load from model_params.json."""
        fp = os.path.join(model_dir, 'model_params.json')
        with open(fp) as f:
            params = json.load(f)
        meta = params['meta']
        args = signature(cls.__init__).parameters
        kwargs = {k: v for k, v in meta.items() if k in args}
        return cls(**kwargs)

    def save(self, out_dir):
        """Write model_params.json."""
        self.save_params(out_dir)

    @property
    def meta(self):
        return {
            'lr_features': self._lr_features,
            's_enhance': self._s_enhance,
            't_enhance': 1,
            'noise_adders': self._noise_adders,
            'temp_lapse': self._temp_lapse,
            'w_delta_temp': self._w_delta_temp,
            'w_delta_topo': self._w_delta_topo,
            'pres_div': self._pres_div,
            'pres_exp': self._pres_exp,
            'interp_method': self._interp_name,
            'fix_bias': self._fix_bias,
            'input_resolution': self._input_resolution,
            'hr_out_features': self.hr_out_features,
            'class': type(self).__name__,
        }

    @meta.setter
    def meta(self, value):
        pass

    @property
    def lr_features(self):
        return self._lr_features

    @property
    def hr_out_features(self):
        return self._lr_features

    @property
    def hr_exo_features(self):
        # no mid-network exo layers; topography routes as the
        # input + output exo steps the sfc-model rule adds in
        # ExoDataHandler.get_exo_steps (reference: exo.py:370-382;
        # the reference model inherits the empty default,
        # interface.py:392)
        return []

    @property
    def input_dims(self):
        return 4

    @property
    def is_4d(self):
        return True

    # feature-index helpers -------------------------------------------
    @property
    def feature_inds_temp(self):
        """Indices of temperature features."""
        return [i for i, f in enumerate(self._lr_features)
                if parse_feature(f)[0] == 'temperature']

    @property
    def feature_inds_rh(self):
        """Indices of relative humidity features."""
        return [i for i, f in enumerate(self._lr_features)
                if parse_feature(f)[0] == 'relativehumidity']

    @property
    def feature_inds_pres(self):
        """Indices of pressure features."""
        return [i for i, f in enumerate(self._lr_features)
                if parse_feature(f)[0] == 'pressure']

    @property
    def feature_inds_other(self):
        """Everything else."""
        known = (set(self.feature_inds_temp) | set(self.feature_inds_rh)
                 | set(self.feature_inds_pres))
        return [i for i in range(len(self._lr_features))
                if i not in known]

    def _get_temp_rh_ind(self, idf_rh):
        """Temperature channel matching an RH channel's height."""
        _, h_rh, _ = parse_feature(self._lr_features[idf_rh])
        suffix = self._lr_features[idf_rh].split('_')[-1]
        for i in self.feature_inds_temp:
            if self._lr_features[i].split('_')[-1] == suffix:
                return i
        raise KeyError(
            f'Could not find temperature feature matching '
            f'"{self._lr_features[idf_rh]}" (needed for RH downscaling)')

    # core physics -----------------------------------------------------
    @classmethod
    def fix_downscaled_bias(cls, single_lr, single_hr,
                            method=Image.Resampling.LANCZOS):
        """Remove low-res-mean bias from a downscaled field."""
        s_enhance = len(single_hr) // len(single_lr)
        re_coarse = spatial_coarsening(
            single_hr[..., None], s_enhance=s_enhance,
            obs_axis=False)[..., 0]
        bias = re_coarse - single_lr
        bc = cls.downscale_arr(bias, s_enhance=s_enhance, method=method)
        return single_hr - bc

    @classmethod
    def downscale_arr(cls, arr, s_enhance,
                      method=Image.Resampling.LANCZOS, fix_bias=False):
        """Image-resample a 2D array by s_enhance."""
        im = Image.fromarray(np.asarray(arr, dtype=np.float32))
        im = im.resize((arr.shape[1] * s_enhance,
                        arr.shape[0] * s_enhance), resample=method)
        out = np.array(im)
        if fix_bias:
            out = cls.fix_downscaled_bias(arr, out, method=method)
        return out

    def downscale_temp(self, single_lr_temp, topo_lr, topo_hr):
        """Lapse-rate-corrected temperature downscaling."""
        lower = np.asarray(single_lr_temp) + topo_lr * self._temp_lapse
        hi = self.downscale_arr(lower, self._s_enhance,
                                method=self._interp_method)
        hi -= topo_hr * self._temp_lapse
        if self._fix_bias:
            hi = self.fix_downscaled_bias(single_lr_temp, hi,
                                          method=self._interp_method)
        return hi

    def downscale_rh(self, single_lr_rh, single_lr_temp, single_hr_temp,
                     topo_lr, topo_hr):
        """RH downscaling: interp + linear corrections from delta-T and
        delta-topography."""
        interp_rh = self.downscale_arr(single_lr_rh, self._s_enhance,
                                       method=self._interp_method)
        interp_temp = self.downscale_arr(single_lr_temp, self._s_enhance,
                                         method=self._interp_method)
        interp_topo = self.downscale_arr(topo_lr, self._s_enhance,
                                         method=self._interp_method)
        hi = (interp_rh
              + self._w_delta_temp * (single_hr_temp - interp_temp)
              + self._w_delta_topo * (topo_hr - interp_topo))
        if self._fix_bias:
            hi = self.fix_downscaled_bias(single_lr_rh, hi,
                                          method=self._interp_method)
        return hi

    def _pres_scale(self, topo):
        return 101325 * (1 - (1 - topo / self._pres_div)
                         ** self._pres_exp)

    def downscale_pres(self, single_lr_pres, topo_lr, topo_hr):
        """Barometric-formula-corrected pressure downscaling."""
        single_lr_pres = np.asarray(single_lr_pres)
        if single_lr_pres.max() < 10000:
            logger.warning('Pressure data appears to not be in Pa')
        lower = single_lr_pres + self._pres_scale(topo_lr)
        hi = self.downscale_arr(lower, self._s_enhance,
                                method=self._interp_method)
        hi -= self._pres_scale(topo_hr)
        if (hi < 0.0).any():
            logger.warning('Downscaled pressure has negative values; '
                           'clipping to 0')
            hi = np.maximum(hi, 0)
        if self._fix_bias:
            hi = self.fix_downscaled_bias(single_lr_pres, hi,
                                          method=self._interp_method)
        return hi

    # ------------------------------------------------------------------
    def train(self, true_hr_temp, true_hr_rh, true_hr_topo,
              input_resolution):
        """Fit the relative-humidity linear model from true high-res
        fields (reference: sup3r/models/surface.py:735-827).

        The temperature lapse rate and pressure scaling are fixed
        parameterizations; only the two RH regression weights are
        trained. The truth fields are coarsened to low-res, re-upscaled
        with the default (LANCZOS) interpolation, and the RH residual is
        regressed (zero intercept) on the temperature and topography
        residuals.

        Parameters
        ----------
        true_hr_temp : np.ndarray
            True high-res daily-average temperature, (lat, lon, n_days).
        true_hr_rh : np.ndarray
            True high-res daily-average relative humidity,
            (lat, lon, n_days).
        true_hr_topo : np.ndarray
            High-res surface elevation in meters, (lat, lon).
        input_resolution : dict
            e.g. ``{'spatial': '20km', 'temporal': '60min'}`` — recorded
            on the model meta.

        Returns
        -------
        w_delta_temp : float
            Fitted weight on (true HR temp - interpolated temp).
        w_delta_topo : float
            Fitted weight on (true HR topo - interpolated topo).
        regr : object
            Fitted zero-intercept linear model with ``coef_``,
            ``intercept_`` and ``predict(x)`` (lstsq; stands in for the
            reference's sklearn LinearRegression).
        x : np.ndarray
            (n, 2) regression inputs (delta-temp, delta-topo).
        y : np.ndarray
            (n,) regression target (delta-RH).
        """
        true_hr_temp = np.asarray(true_hr_temp)
        true_hr_rh = np.asarray(true_hr_rh)
        true_hr_topo = np.asarray(true_hr_topo)
        assert true_hr_temp.ndim == 3, 'Bad true_hr_temp shape'
        assert true_hr_rh.ndim == 3, 'Bad true_hr_rh shape'
        assert true_hr_topo.ndim == 2, 'Bad true_hr_topo shape'
        self._input_resolution = input_resolution

        topo_days = np.repeat(true_hr_topo[..., None],
                              true_hr_temp.shape[-1], axis=-1)

        def _residual(hr_field):
            # truth minus coarsen->LANCZOS-upscale reconstruction,
            # per day (the reference uses downscale_arr's default
            # method here, not the model's interp_method)
            lr = spatial_coarsening(hr_field, s_enhance=self._s_enhance,
                                    obs_axis=False)
            interp = np.stack(
                [self.downscale_arr(np.asarray(lr[..., i]),
                                    self._s_enhance)
                 for i in range(lr.shape[-1])], axis=-1)
            return np.asarray(hr_field, dtype=np.float32) - interp

        x = np.vstack((_residual(true_hr_temp).ravel(),
                       _residual(topo_days).ravel())).T
        y = _residual(true_hr_rh).ravel()

        coef, *_ = np.linalg.lstsq(
            x.astype(np.float64), y.astype(np.float64), rcond=None)

        class _LinearFit:
            coef_ = coef
            intercept_ = 0.0

            @staticmethod
            def predict(xq):
                return np.asarray(xq) @ coef

        w_delta_temp, w_delta_topo = float(coef[0]), float(coef[1])
        logger.info(
            'Trained RH model weights: w_delta_temp=%.6f '
            'w_delta_topo=%.6f (defaults %.6f / %.6f)', w_delta_temp,
            w_delta_topo, self.W_DELTA_TEMP, self.W_DELTA_TOPO)
        return w_delta_temp, w_delta_topo, _LinearFit(), x, y

    # ------------------------------------------------------------------
    @staticmethod
    def _get_topo_from_exo(exogenous_data):
        """(lr_topo, hr_topo) 2D arrays from the exo dict."""
        exo = [step['data'] for step in
               exogenous_data['topography']['steps']]
        assert len(exo) == 2, (
            'SurfaceSpatialMetModel needs exactly 2 topography steps '
            '(low-res then high-res)')
        lr_topo, hr_topo = exo
        if np.asarray(lr_topo).ndim == 4:
            lr_topo = np.asarray(lr_topo)[0, :, :, 0]
        if np.asarray(hr_topo).ndim == 4:
            hr_topo = np.asarray(hr_topo)[0, :, :, 0]
        if np.asarray(lr_topo).ndim == 3:
            lr_topo = np.asarray(lr_topo)[..., 0]
        if np.asarray(hr_topo).ndim == 3:
            hr_topo = np.asarray(hr_topo)[..., 0]
        return np.asarray(lr_topo), np.asarray(hr_topo)

    def generate(self, low_res, norm_in=False, un_norm_out=False,
                 exogenous_data=None):
        """Downscale a 4D (n, s1, s2, f) batch of physical-units met
        data."""
        low_res = np.asarray(low_res)
        lr_topo, hr_topo = self._get_topo_from_exo(exogenous_data)
        assert lr_topo.shape == low_res.shape[1:3], (
            f'lr topo shape {lr_topo.shape} does not match input '
            f'{low_res.shape}')
        s_enhance = len(hr_topo) // len(lr_topo)
        assert s_enhance == self._s_enhance, (
            f'Topo shapes suggest s_enhance={s_enhance}, model has '
            f'{self._s_enhance}')

        hr_shape = (len(low_res), low_res.shape[1] * self._s_enhance,
                    low_res.shape[2] * self._s_enhance,
                    len(self.hr_out_features))
        hi_res = np.zeros(hr_shape, dtype=np.float32)
        for iobs in range(len(low_res)):
            for idf in self.feature_inds_temp:
                hi_res[iobs, ..., idf] = self.downscale_temp(
                    low_res[iobs, ..., idf], lr_topo, hr_topo)
            for idf in self.feature_inds_pres:
                hi_res[iobs, ..., idf] = self.downscale_pres(
                    low_res[iobs, ..., idf], lr_topo, hr_topo)
            for idf in self.feature_inds_rh:
                idt = self._get_temp_rh_ind(idf)
                hi_res[iobs, ..., idf] = self.downscale_rh(
                    low_res[iobs, ..., idf], low_res[iobs, ..., idt],
                    hi_res[iobs, ..., idt], lr_topo, hr_topo)
            for idf in self.feature_inds_other:
                hi_res[iobs, ..., idf] = self.downscale_arr(
                    low_res[iobs, ..., idf], self._s_enhance,
                    method=self._interp_method,
                    fix_bias=self._fix_bias)

        if self._noise_adders is not None:
            for idf, stdev in enumerate(self._noise_adders):
                if stdev is not None:
                    hi_res[..., idf] += RANDOM_GENERATOR.uniform(
                        0, stdev, hi_res.shape[:-1])
        return hi_res
