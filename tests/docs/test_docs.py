"""API surface checks: every public class/function in the package has
a docstring, and the model zoo exposes the inference contract
(mirrors the reference's tests/docs signature automation intent)."""

import importlib
import inspect
import pkgutil

import pytest

import sup3r_tpu

MODULES = [
    'sup3r_tpu.names', 'sup3r_tpu.ops.coarsen', 'sup3r_tpu.ops.interp',
    'sup3r_tpu.ops.wind', 'sup3r_tpu.ops.losses',
    'sup3r_tpu.ops.solar_pos', 'sup3r_tpu.preprocessing.grid',
    'sup3r_tpu.preprocessing.loaders',
    'sup3r_tpu.preprocessing.rasterizers',
    'sup3r_tpu.preprocessing.derivers',
    'sup3r_tpu.preprocessing.data_handlers',
    'sup3r_tpu.preprocessing.samplers',
    'sup3r_tpu.preprocessing.batch_queues',
    'sup3r_tpu.preprocessing.batch_handlers',
    'sup3r_tpu.preprocessing.exo', 'sup3r_tpu.models.layers',
    'sup3r_tpu.models.network', 'sup3r_tpu.models.gan',
    'sup3r_tpu.models.multi_step', 'sup3r_tpu.models.surface',
    'sup3r_tpu.pipeline.slicer', 'sup3r_tpu.pipeline.strategy',
    'sup3r_tpu.pipeline.forward_pass',
    'sup3r_tpu.postprocessing.writers',
    'sup3r_tpu.postprocessing.collectors', 'sup3r_tpu.bias.transforms',
    'sup3r_tpu.bias.bias_calc', 'sup3r_tpu.solar.solar',
    'sup3r_tpu.qa.qa', 'sup3r_tpu.cli',
]


@pytest.mark.parametrize('module_name', MODULES)
def test_public_api_documented(module_name):
    mod = importlib.import_module(module_name)
    assert mod.__doc__, f'{module_name} missing module docstring'
    missing = []
    for name, obj in vars(mod).items():
        if name.startswith('_') or not callable(obj):
            continue
        if getattr(obj, '__module__', None) != module_name:
            continue
        if not inspect.getdoc(obj):
            missing.append(name)
    assert not missing, (
        f'{module_name} has undocumented public objects: {missing}')


def test_model_zoo_inference_contract():
    """Every model class exposes generate/load and feature lists."""
    import sup3r_tpu.models as m

    zoo = [m.Sup3rGan, m.Sup3rGanDC, m.Sup3rCondMom, m.Sup3rGanWithObs,
           m.SolarCC, m.MultiStepGan, m.MultiStepSurfaceMetGan,
           m.SolarMultiStepGan, m.SurfaceSpatialMetModel,
           m.LinearInterp]
    for cls in zoo:
        assert hasattr(cls, 'generate'), cls
        assert hasattr(cls, 'load'), cls
        assert hasattr(cls, 'lr_features'), cls
        assert hasattr(cls, 'hr_out_features'), cls


def test_reference_config_names_available():
    """All reference architecture families are constructible by name."""
    from sup3r_tpu.configs import CONFIGS, get_config

    expected = ['spatial/gen_2x_1f', 'spatial/gen_2x_2f',
                'spatial/gen_10x_2f', 'spatial/disc',
                'spatiotemporal/gen_3x_4x_2f', 'spatiotemporal/disc',
                'sup3rcc/gen_trh_1x_24x_2f',
                'sup3rcc/gen_wind_5x_1x_6f',
                'sup3rcc/gen_solar_1x_8x_1f']
    for name in expected:
        assert name in CONFIGS
        assert get_config(name)['hidden_layers']
