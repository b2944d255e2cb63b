"""LinearInterp: tri-linear interpolation baseline model.

Reference parity: sup3r/models/linear.py:15-171.
"""

import json
import logging
import os
from inspect import signature

import numpy as np

from sup3r_tpu.models.abstract import AbstractInterface
from sup3r_tpu.ops import st_interp

logger = logging.getLogger(__name__)


class LinearInterp(AbstractInterface):
    """Baseline spatiotemporal bilinear/trilinear interpolation model."""

    def __init__(self, lr_features, s_enhance, t_enhance,
                 t_centered=False, input_resolution=None):
        self._lr_features = [f.lower() for f in lr_features]
        self._s_enhance = s_enhance
        self._t_enhance = t_enhance
        self._t_centered = t_centered
        self._input_resolution = input_resolution

    @classmethod
    def load(cls, model_dir, verbose=False):
        """Load from a model_params.json-bearing directory."""
        fp = os.path.join(model_dir, 'model_params.json')
        with open(fp) as f:
            params = json.load(f)
        meta = params['meta']
        args = signature(cls.__init__).parameters
        return cls(**{k: v for k, v in meta.items() if k in args})

    @property
    def meta(self):
        return {
            'input_resolution': self._input_resolution,
            'lr_features': self._lr_features,
            's_enhance': self._s_enhance,
            't_enhance': self._t_enhance,
            't_centered': self._t_centered,
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
        return []

    @property
    def input_dims(self):
        return 5

    def save(self, out_dir):
        """Write model_params.json."""
        self.save_params(out_dir)

    def generate(self, low_res, norm_in=False, un_norm_out=False,
                 exogenous_data=None):
        """Interpolate a 5D (n, s1, s2, t, f) batch to the enhanced
        grid."""
        hr_shape = (len(low_res),
                    low_res.shape[1] * self._s_enhance,
                    low_res.shape[2] * self._s_enhance,
                    low_res.shape[3] * self._t_enhance,
                    len(self.hr_out_features))
        hi_res = np.zeros(hr_shape, dtype=np.float32)
        for iobs in range(len(low_res)):
            for idf in range(low_res.shape[-1]):
                hi_res[iobs, ..., idf] = np.asarray(st_interp(
                    low_res[iobs, ..., idf], self._s_enhance,
                    self._t_enhance, t_centered=self._t_centered))
        return hi_res
