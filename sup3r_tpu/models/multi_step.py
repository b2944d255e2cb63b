"""Multi-step model chains: serial GANs, surface-met + temporal chains,
and the Sup3rCC solar composite.

Reference parity: sup3r/models/multi_step.py:20-886 (MultiStepGan :23,
MultiStepSurfaceMetGan :340, SolarMultiStepGan :484).
"""

import json
import logging
import os

import numpy as np

from sup3r_tpu.models.abstract import AbstractInterface
from sup3r_tpu.preprocessing.exo import ExoData

logger = logging.getLogger(__name__)


class MultiStepGan(AbstractInterface):
    """Serial chain of one or more loaded models."""

    def __init__(self, models):
        self._models = tuple(models)

    def __len__(self):
        return len(self._models)

    @classmethod
    def load(cls, model_dirs, model_kwargs=None, verbose=True):
        """Load each step's model from its save dir, dispatching on the
        'class' recorded in each model_params.json."""
        import sup3r_tpu.models as models_mod

        if isinstance(model_dirs, str):
            model_dirs = [model_dirs]
        model_kwargs = model_kwargs or [{}] * len(model_dirs)
        if isinstance(model_kwargs, dict):
            # ONE dict applies to every step — wrapping it as a
            # 1-element list would zip-truncate a multi-step chain to
            # its first model with no error (the reference has the
            # same defect, multi_step.py:69-72)
            model_kwargs = [model_kwargs] * len(model_dirs)
        if len(model_kwargs) != len(model_dirs):
            raise ValueError(
                f'Got {len(model_kwargs)} model_kwargs for '
                f'{len(model_dirs)} model_dirs')
        models = []
        for model_dir, kwargs in zip(model_dirs, model_kwargs):
            fp = os.path.join(model_dir, 'model_params.json')
            with open(fp) as f:
                params = json.load(f)
            class_name = params.get('meta', {}).get('class', 'Sup3rGan')
            ModelClass = getattr(models_mod, class_name)
            # a per-step 'verbose' in model_kwargs wins over the
            # top-level flag (passing both raised TypeError)
            models.append(ModelClass.load(
                model_dir, **{'verbose': verbose, **kwargs}))
        return cls(models)

    @property
    def models(self):
        """Ordered tuple of the models in this chain."""
        return self._models

    @property
    def inference_mode(self):
        """Chain-level inference profile: the common mode of the
        member models that support one (see
        :attr:`Sup3rGan.inference_mode`), or ``'custom'`` if they
        disagree."""
        modes = {m.inference_mode for m in self._models
                 if hasattr(type(m), 'inference_mode')}
        if len(modes) == 1:
            return modes.pop()
        return 'custom' if modes else 'exact'

    @inference_mode.setter
    def inference_mode(self, mode):
        supported = [m for m in self._models
                     if hasattr(type(m), 'inference_mode')]
        if mode != 'exact' and not supported:
            raise ValueError(
                f'No member of this {type(self).__name__} supports '
                f'inference_mode={mode!r}')
        for m in supported:
            m.inference_mode = mode

    @property
    def meta(self):
        """Tuple of each step's meta."""
        return tuple(m.meta for m in self._models)

    @property
    def means(self):
        return tuple(getattr(m, '_means', None) for m in self._models)

    @property
    def stdevs(self):
        return tuple(getattr(m, '_stdevs', None) for m in self._models)

    # enhancement aggregation ------------------------------------------
    @property
    def s_enhancements(self):
        return [m.s_enhance for m in self._models]

    @property
    def t_enhancements(self):
        return [m.t_enhance for m in self._models]

    @property
    def s_enhance(self):
        return int(np.prod(self.s_enhancements))

    @property
    def t_enhance(self):
        return int(np.prod(self.t_enhancements))

    @property
    def lr_features(self):
        """First model's input features."""
        return self._models[0].lr_features

    @property
    def hr_out_features(self):
        """Last model's output features."""
        return self._models[-1].hr_out_features

    @property
    def hr_exo_features(self):
        """Last model's exo features."""
        return self._models[-1].hr_exo_features

    @property
    def obs_features(self):
        return self._models[-1].obs_features

    @property
    def input_dims(self):
        return self._models[0].input_dims

    @property
    def is_4d(self):
        return self.input_dims == 4

    # ------------------------------------------------------------------
    @staticmethod
    def _transpose_model_input(model, hi_res):
        """Move between 4D (t, s1, s2, f) and 5D (1, s1, s2, t, f)
        layouts between steps (reference: multi_step.py:128)."""
        if model.is_5d and hi_res.ndim == 4:
            return np.transpose(hi_res, (1, 2, 0, 3))[None]
        if model.is_4d and hi_res.ndim == 5:
            assert hi_res.shape[0] == 1, (
                f'Cannot feed batched 5D data {hi_res.shape} to a 4D '
                'model')
            return np.transpose(hi_res[0], (2, 0, 1, 3))
        assert model.input_dims == hi_res.ndim, (
            f'Shape {hi_res.shape} does not fit a '
            f'{model.input_dims}D model')
        return hi_res

    def _match_model_input(self, model_step, hi_res, exo_data):
        """Select the previous step's output channels the next step needs
        (reference: multi_step.py:172)."""
        if model_step == 0:
            return hi_res
        current = self._models[model_step]
        previous = self._models[model_step - 1]
        output_feats = previous.hr_out_features
        exo_data = exo_data or {}
        input_feats = [f for f in current.lr_features
                       if f not in exo_data]
        if not set(input_feats).issubset(output_feats):
            raise ValueError(
                f'Step {model_step} inputs {input_feats} not all in '
                f'previous step outputs {output_feats}')
        idx = [output_feats.index(f) for f in input_feats]
        return hi_res[..., idx]

    def generate(self, low_res, norm_in=True, un_norm_out=True,
                 exogenous_data=None):
        """Run all steps in serial (reference: multi_step.py:196)."""
        if isinstance(exogenous_data, dict) and not isinstance(
                exogenous_data, ExoData):
            exogenous_data = ExoData(exogenous_data)
        hi_res = np.asarray(low_res).copy()
        for i, model in enumerate(self._models):
            i_norm_in = not (i == 0 and not norm_in)
            i_un_norm_out = not (
                i + 1 == len(self._models) and not un_norm_out)
            i_exo = (None if exogenous_data is None
                     else exogenous_data.get_model_step_exo(i))
            hi_res = self._transpose_model_input(model, hi_res)
            hi_res = self._match_model_input(i, hi_res, i_exo)
            hi_res = model.generate(hi_res, norm_in=i_norm_in,
                                    un_norm_out=i_un_norm_out,
                                    exogenous_data=i_exo)
        return hi_res

    def save(self, out_dir):
        """Save each step model to a numbered subdirectory."""
        for i, model in enumerate(self._models):
            model.save(os.path.join(out_dir, f'model_step_{i}'))


class MultiStepSurfaceMetGan(MultiStepGan):
    """2-step chain: SurfaceSpatialMetModel (4D spatial met physics) ->
    (spatio)temporal GAN (reference: multi_step.py:340)."""

    def generate(self, low_res, norm_in=True, un_norm_out=True,
                 exogenous_data=None):
        assert low_res.ndim == 4, (
            'MultiStepSurfaceMetGan needs 4D (t, s1, s2, f) input')
        assert exogenous_data is not None and (
            'topography' in exogenous_data), (
            'MultiStepSurfaceMetGan needs topography exogenous_data '
            'with low- and high-res steps')
        return super().generate(low_res, norm_in, un_norm_out,
                                exogenous_data)

    @classmethod
    def load(cls, surface_model_class='SurfaceSpatialMetModel',
             temporal_model_class='MultiStepGan',
             surface_model_kwargs=None, temporal_model_kwargs=None,
             verbose=True):
        """Load from surface + temporal model kwargs (reference:
        multi_step.py:440)."""
        import sup3r_tpu.models as models_mod

        surface_model_kwargs = surface_model_kwargs or {}
        temporal_model_kwargs = temporal_model_kwargs or {}
        SurfaceClass = getattr(models_mod, surface_model_class)
        TemporalClass = getattr(models_mod, temporal_model_class)
        surface = SurfaceClass.load(verbose=verbose,
                                    **surface_model_kwargs)
        temporal = TemporalClass.load(verbose=verbose,
                                      **temporal_model_kwargs)
        t_models = getattr(temporal, 'models', [temporal])
        return cls([surface, *t_models])


class SolarMultiStepGan(MultiStepGan):
    """Sup3rCC solar composite: parallel spatial solar-csr + spatial
    wind GANs, concatenated into the temporal SolarCC GAN (reference:
    multi_step.py:484-886)."""

    def __init__(self, spatial_solar_models, spatial_wind_models,
                 temporal_solar_models, t_enhance=None):
        super().__init__(models=[*spatial_wind_models.models,
                                 *temporal_solar_models.models])
        self._spatial_solar_models = spatial_solar_models
        self._spatial_wind_models = spatial_wind_models
        self._temporal_solar_models = temporal_solar_models
        self._t_enhance = t_enhance
        self.preflight()
        if t_enhance is not None:
            assert len(temporal_solar_models.models) == 1, (
                'Can only override t_enhance for a single temporal '
                'model')
            temporal_solar_models.models[0].meta['t_enhance'] = t_enhance

    def preflight(self):
        """Consistency checks across the three model groups."""
        s_enh = np.prod(self._spatial_solar_models.s_enhancements)
        w_enh = np.prod(self._spatial_wind_models.s_enhancements)
        assert s_enh == w_enh, (
            f'Solar ({s_enh}) and wind ({w_enh}) spatial enhancements '
            'must match')
        assert self._spatial_solar_models.lr_features == [
            'clearsky_ratio'], (
            'Spatial solar models must input only clearsky_ratio')
        assert self._spatial_solar_models.hr_out_features == [
            'clearsky_ratio'], (
            'Spatial solar models must output only clearsky_ratio')
        t_feats = self._temporal_solar_models.lr_features
        assert t_feats[0] == 'clearsky_ratio', (
            'Temporal solar model input feature 0 must be '
            f'clearsky_ratio, got {t_feats}')
        available = (self._spatial_wind_models.hr_out_features
                     + self._spatial_solar_models.hr_out_features)
        missing = [f for f in t_feats if f not in available]
        assert not missing, (
            f'Temporal solar model needs {missing} not produced by the '
            'spatial models')

    @property
    def spatial_solar_models(self):
        return self._spatial_solar_models

    @property
    def spatial_wind_models(self):
        return self._spatial_wind_models

    @property
    def temporal_solar_models(self):
        return self._temporal_solar_models

    @property
    def meta(self):
        return (self._spatial_solar_models.meta
                + self._spatial_wind_models.meta
                + self._temporal_solar_models.meta)

    @property
    def lr_features(self):
        return (self._spatial_solar_models.lr_features
                + self._spatial_wind_models.lr_features)

    @property
    def hr_out_features(self):
        return self._temporal_solar_models.hr_out_features

    @property
    def idf_wind(self):
        """Input channel indices for the wind models (minus topo)."""
        return np.array([
            self.lr_features.index(f)
            for f in self._spatial_wind_models.lr_features
            if f != 'topography'])

    @property
    def idf_solar(self):
        """Input channel indices for the solar models (minus topo)."""
        return np.array([
            self.lr_features.index(f)
            for f in self._spatial_solar_models.lr_features
            if f != 'topography'])

    @property
    def idf_wind_out(self):
        """Wind output channels the temporal model consumes."""
        t_feats = self._temporal_solar_models.lr_features
        return np.array([
            self._spatial_wind_models.hr_out_features.index(f)
            for f in t_feats[1:]])

    def generate(self, low_res, norm_in=True, un_norm_out=True,
                 exogenous_data=None):
        """4D (t, s1, s2, f) in -> 5D (1, s1, s2, t*enh, 1) csr out."""
        if isinstance(exogenous_data, dict) and not isinstance(
                exogenous_data, ExoData):
            exogenous_data = ExoData(exogenous_data)
        if exogenous_data is not None:
            s_exo, t_exo = exogenous_data.split(
                [len(self._spatial_wind_models)])
        else:
            s_exo = t_exo = None
        hi_res_wind = self._spatial_wind_models.generate(
            low_res[..., self.idf_wind], norm_in=norm_in,
            un_norm_out=True, exogenous_data=s_exo)
        hi_res_solar = self._spatial_solar_models.generate(
            low_res[..., self.idf_solar], norm_in=norm_in,
            un_norm_out=True)
        hi_res = np.concatenate(
            [hi_res_solar, hi_res_wind[..., self.idf_wind_out]], axis=3)
        hi_res = np.transpose(hi_res, (1, 2, 0, 3))[None]
        hi_res = self._temporal_solar_models.generate(
            hi_res, norm_in=True, un_norm_out=un_norm_out,
            exogenous_data=t_exo)
        return self.temporal_pad(low_res, hi_res)

    def temporal_pad(self, low_res, hi_res, mode='reflect'):
        """Pad the output time axis so it matches t_in * t_enhance
        (SolarCC crops its daylight window; reference:
        multi_step.py:824)."""
        t_shape = low_res.shape[0] * self.t_enhance
        t_pad = int((t_shape - hi_res.shape[-2]) / 2)
        if t_pad > 0:
            pad_width = ((0, 0), (0, 0), (0, 0), (t_pad, t_pad), (0, 0))
            hi_res = np.pad(hi_res, pad_width, mode=mode)
        return hi_res

    @classmethod
    def load(cls, spatial_solar_model_dirs, spatial_wind_model_dirs,
             temporal_solar_model_dirs, t_enhance=None, verbose=True):
        """Load the three model groups from their save dirs."""
        ssm = MultiStepGan.load(spatial_solar_model_dirs,
                                verbose=verbose)
        swm = MultiStepGan.load(spatial_wind_model_dirs, verbose=verbose)
        tsm = MultiStepGan.load(temporal_solar_model_dirs,
                                verbose=verbose)
        return cls(ssm, swm, tsm, t_enhance=t_enhance)
