"""Deep multistep + exogenous-data forward-pass chains (mirrors
reference tests/forward_pass/test_forward_pass_exo.py:49-1030):
exo-skipping temporal steps, MultiStepSurfaceMetGan, LinearInterp +
topo-GAN chains, and simultaneous topography + sza exo routing."""

import numpy as np
import pytest

from sup3r_tpu.models import (
    LinearInterp,
    MultiStepGan,
    Sup3rGan,
    SurfaceSpatialMetModel,
)
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)


def _topo_spatial_gan(tmp_path, name, features, s_enhance=2):
    """2x spatial GAN taking topography as input channel + mid-layer
    Sup3rConcat."""
    gen = [
        {'class': 'Conv2D', 'filters': 8 * s_enhance ** 2,
         'kernel_size': 3, 'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': s_enhance},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcat', 'name': 'topography'},
        {'class': 'Conv2D', 'filters': len(features), 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(
        lr_features=[*features, 'topography'],
        hr_out_features=features, s_enhance=s_enhance, t_enhance=1,
        input_resolution={'spatial': '12km', 'temporal': '60min'})
    stats = {f: 0.0 for f in [*features, 'topography']}
    model.set_norm_stats(stats, {k: 1.0 for k in stats})
    model.init_weights((1, 4, 4, len(features) + 1),
                       (1, 4 * s_enhance, 4 * s_enhance, len(features)))
    d = str(tmp_path / name)
    model.save(d)
    return d


def _plain_temporal_gan(tmp_path, name, features, t_enhance=4):
    """Temporal-only ST GAN with NO exo input."""
    gen = [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': t_enhance,
         'temporal_method': 'nearest'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv3D', 'filters': len(features), 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(
        lr_features=features, hr_out_features=features,
        s_enhance=1, t_enhance=t_enhance,
        input_resolution={'spatial': '6km', 'temporal': '60min'})
    model.set_norm_stats({f: 0.0 for f in features},
                         {f: 1.0 for f in features})
    model.init_weights((1, 8, 8, 2, len(features)),
                       (1, 8, 8, 2 * t_enhance, len(features)))
    d = str(tmp_path / name)
    model.save(d)
    return d


def _input_and_topo(tmp_path, shape=(8, 8, 4)):
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'), shape,
                                   ['u100', 'v100'])
    topo_file = make_fake_h5_file(
        str(tmp_path / 'topo.h5'), (40, 40, 2), ['windspeed_10m'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1))
    return input_file, topo_file


def test_multistep_exoskip(tmp_path):
    """Spatial topo-GAN -> plain temporal GAN: exo steps target ONLY
    model 0; the temporal step runs without exo (reference:
    test_forward_pass_exo.py:49-158)."""
    features = ['u_100m', 'v_100m']
    input_file, topo_file = _input_and_topo(tmp_path)
    m1 = _topo_spatial_gan(tmp_path, 'm1', features)
    m2 = _plain_temporal_gan(tmp_path, 'm2', features)

    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='MultiStepGan',
        model_kwargs={'model_dirs': [m1, m2]},
        fwp_chunk_shape=(8, 8, 4),
        spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'topography': {
            'source_file': topo_file,
            'cache_dir': str(tmp_path / 'exo')}},
        out_pattern=None)
    steps = strategy.exo_data['topography']['steps']
    assert {s['model'] for s in steps} == {0}
    combos = {(s['model'], s['combine_type']) for s in steps}
    assert combos == {(0, 'input'), (0, 'layer')}

    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (16, 16, 16, 2)
    assert np.isfinite(outputs[0]).all()


def test_linear_then_topo_gan_chain(tmp_path):
    """LinearInterp first step + topo-GAN second step through the
    forward pass (reference: test_forward_pass_exo.py:654-727)."""
    features = ['u_100m', 'v_100m']
    input_file, topo_file = _input_and_topo(tmp_path)
    lin = LinearInterp(lr_features=features, s_enhance=2, t_enhance=1)
    lin_dir = str(tmp_path / 'lin')
    lin.save(lin_dir)
    gan = _topo_spatial_gan(tmp_path, 'gan', features)

    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='MultiStepGan',
        model_kwargs={'model_dirs': [lin_dir, gan]},
        fwp_chunk_shape=(8, 8, 4),
        spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'topography': {
            'source_file': topo_file,
            'cache_dir': str(tmp_path / 'exo')}},
        out_pattern=None)
    # exo only feeds the GAN step (model 1) at 2x/4x resolutions
    steps = strategy.exo_data['topography']['steps']
    assert {s['model'] for s in steps} == {1}
    enh = {s['combine_type']: s['s_enhance'] for s in steps}
    assert enh == {'input': 2, 'layer': 4}

    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (32, 32, 4, 2)
    assert np.isfinite(outputs[0]).all()


def test_surface_met_gan_chain(tmp_path):
    """MultiStepSurfaceMetGan: physics surface downscaler + temporal
    GAN with lr+hr topography steps (reference:
    test_forward_pass_exo.py:364-433 + multi_step.py:340)."""
    features = ['temperature_2m', 'relativehumidity_2m']
    input_file = make_fake_nc_file(str(tmp_path / 'met.nc'), (8, 8, 4),
                                   features)
    topo_file = make_fake_h5_file(
        str(tmp_path / 'topo.h5'), (40, 40, 2), ['windspeed_10m'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1))

    surf = SurfaceSpatialMetModel(features, s_enhance=2)
    surf_dir = str(tmp_path / 'surf')
    surf.save(surf_dir)
    temp_dir = _plain_temporal_gan(tmp_path, 'temp', features)

    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='MultiStepSurfaceMetGan',
        model_kwargs={
            'surface_model_kwargs': {'model_dir': surf_dir},
            'temporal_model_kwargs': {'model_dirs': [temp_dir]}},
        fwp_chunk_shape=(8, 8, 4),
        spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'topography': {
            'source_file': topo_file,
            'cache_dir': str(tmp_path / 'exo'),
            'steps': [
                {'model': 0, 'combine_type': 'input',
                 's_enhance': 1, 't_enhance': 1},
                {'model': 0, 'combine_type': 'layer',
                 's_enhance': 2, 't_enhance': 1}]}},
        out_pattern=None)
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (16, 16, 16, 2)
    assert np.isfinite(outputs[0]).all()
    # physics sanity: RH stays within 0-100 after downscaling+GAN isn't
    # guaranteed, but the surface step's own output must not explode
    model = strategy.get_model()
    lr = np.transpose(
        strategy.input_handler.data.data[..., :2], (2, 0, 1, 3))
    exo = strategy.exo_data.get_model_step_exo(0)
    hi = model.models[0].generate(lr, exogenous_data=exo)
    assert hi.shape == (4, 16, 16, 2)
    assert np.isfinite(hi).all()


def test_multi_exo_topo_and_sza(tmp_path):
    """One model consuming topography AND sza exo simultaneously
    (reference: test_forward_pass_exo.py:729-1030)."""
    features = ['u_100m', 'v_100m']
    input_file, topo_file = _input_and_topo(tmp_path)
    gen = [
        {'class': 'Conv2D', 'filters': 32, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcat', 'name': 'topography'},
        {'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'Sup3rConcat', 'name': 'sza'},
        {'class': 'Conv2D', 'filters': len(features), 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(
        lr_features=[*features, 'topography', 'sza'],
        hr_out_features=features, s_enhance=2, t_enhance=1,
        input_resolution={'spatial': '12km', 'temporal': '60min'})
    stats = {f: 0.0 for f in [*features, 'topography', 'sza']}
    model.set_norm_stats(stats, {k: 1.0 for k in stats})
    model.init_weights((1, 4, 4, 4), (1, 8, 8, 2))
    mdir = str(tmp_path / 'multi_exo')
    model.save(mdir)

    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='Sup3rGan',
        model_kwargs={'model_dir': mdir},
        fwp_chunk_shape=(8, 8, 4),
        spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={
            'topography': {'source_file': topo_file,
                           'cache_dir': str(tmp_path / 'exo')},
            'sza': {'cache_dir': str(tmp_path / 'exo')}},
        out_pattern=None)
    assert set(strategy.exo_data) == {'topography', 'sza'}
    sza_steps = strategy.exo_data['sza']['steps']
    assert {s['combine_type'] for s in sza_steps} == {'input', 'layer'}

    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (16, 16, 4, 2)
    assert np.isfinite(outputs[0]).all()
