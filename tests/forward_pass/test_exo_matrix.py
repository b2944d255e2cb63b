"""Exo combine-type x feature x chain-shape matrix completion
(mirrors reference tests/forward_pass/test_forward_pass_exo.py
cells not covered by test_exo_chains/test_multistep_exo_fwp/
test_obs_sza_fwp): combine_type='output', obs and sza inside
multistep chains, and a 3-step chain with exo-skipping."""

import numpy as np
import pytest

from sup3r_tpu.models import MultiStepGan, Sup3rGan, Sup3rGanWithObs
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)

FEATURES = ['u_100m', 'v_100m']


def _disc(is_5d=False):
    return [{'class': 'Conv3D' if is_5d else 'Conv2D', 'filters': 4,
             'kernel_size': 3, 'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]


def _spatial_topo_gan(tmp_path, name, s_enhance=2,
                      out_features=FEATURES, extra_exo_layer=None):
    """2x spatial GAN: topo input channel + Sup3rConcat mid-layer
    (+ optionally another exo concat layer)."""
    layers = [
        {'class': 'Conv2D', 'filters': 8 * s_enhance ** 2,
         'kernel_size': 3, 'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': s_enhance},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcat', 'name': 'topography'},
    ]
    if extra_exo_layer:
        layers += [{'class': 'Conv2D', 'filters': 8,
                    'kernel_size': 3, 'strides': 1,
                    'padding': 'same'},
                   {'class': 'Sup3rConcat', 'name': extra_exo_layer}]
    layers += [{'class': 'Conv2D', 'filters': len(FEATURES),
                'kernel_size': 3, 'strides': 1, 'padding': 'same'}]
    model = Sup3rGan(layers, _disc())
    lr_feats = [*FEATURES, 'topography']
    if extra_exo_layer:
        lr_feats.append(extra_exo_layer)
    model.meta.update(
        lr_features=lr_feats, hr_out_features=list(out_features),
        s_enhance=s_enhance, t_enhance=1,
        input_resolution={'spatial': '12km', 'temporal': '60min'})
    stats = {f: 0.0 for f in lr_feats}
    model.set_norm_stats(stats, {k: 1.0 for k in stats})
    model.init_weights((1, 4, 4, len(lr_feats)),
                       (1, 4 * s_enhance, 4 * s_enhance,
                        len(FEATURES)))
    d = str(tmp_path / name)
    model.save(d)
    return d


def _temporal_gan(tmp_path, name, t_enhance=4, sza_layer=False):
    layers = [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion',
         'temporal_mult': t_enhance, 'temporal_method': 'nearest'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
    ]
    lr_feats = list(FEATURES)
    if sza_layer:
        layers.append({'class': 'Sup3rConcat', 'name': 'sza'})
        lr_feats.append('sza')
    layers.append({'class': 'Conv3D', 'filters': len(FEATURES),
                   'kernel_size': 3, 'strides': 1,
                   'padding': 'same'})
    model = Sup3rGan(layers, _disc(is_5d=True))
    model.meta.update(
        lr_features=lr_feats, hr_out_features=list(FEATURES),
        s_enhance=1, t_enhance=t_enhance,
        input_resolution={'spatial': '6km', 'temporal': '60min'})
    stats = {f: 0.0 for f in lr_feats}
    model.set_norm_stats(stats, {k: 1.0 for k in stats})
    model.init_weights((1, 8, 8, 2, len(lr_feats)),
                       (1, 8, 8, 2 * t_enhance, len(FEATURES)))
    d = str(tmp_path / name)
    model.save(d)
    return d


def _inputs(tmp_path, shape=(8, 8, 4)):
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'), shape,
                                   ['u100', 'v100'])
    topo_file = make_fake_h5_file(
        str(tmp_path / 'topo.h5'), (40, 40, 2), ['windspeed_10m'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1))
    return input_file, topo_file


def test_output_combine_single_model(tmp_path):
    """combine_type='output' with the physics surface model — the
    reference's output-combine cell: lr topo in, hr topo consumed for
    downscaling and available as the output step (reference:
    test_forward_pass_exo.py:364-433)."""
    from sup3r_tpu.models import SurfaceSpatialMetModel

    features = ['temperature_2m', 'relativehumidity_2m']
    input_file = make_fake_nc_file(
        str(tmp_path / 'met.nc'), (8, 8, 4), features)
    _, topo_file = _inputs(tmp_path)
    surf = SurfaceSpatialMetModel(features, s_enhance=2)
    sdir = str(tmp_path / 'surf')
    surf.save(sdir)
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='SurfaceSpatialMetModel',
        model_kwargs={'model_dir': sdir},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'topography': {
            'source_file': topo_file,
            'cache_dir': str(tmp_path / 'exo'),
            'steps': [
                {'model': 0, 'combine_type': 'input',
                 's_enhance': 1, 't_enhance': 1},
                {'model': 0, 'combine_type': 'output',
                 's_enhance': 2, 't_enhance': 1}]}},
        out_pattern=None)
    steps = strategy.exo_data['topography']['steps']
    assert [s['combine_type'] for s in steps] == ['input', 'output']
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (16, 16, 4, 2)
    assert np.isfinite(outputs[0]).all()


def test_output_combine_steps_inferred_for_sfc_model(tmp_path):
    """Without explicit steps, the sfc-model rule infers the
    input+output topography pair (reference: exo.py:370-382)."""
    from sup3r_tpu.models import SurfaceSpatialMetModel
    from sup3r_tpu.preprocessing.exo import ExoDataHandler

    features = ['temperature_2m', 'relativehumidity_2m']
    surf = SurfaceSpatialMetModel(features, s_enhance=2)
    steps = ExoDataHandler.get_exo_steps('topography', [surf])
    assert [s['combine_type'] for s in steps] == ['input', 'output']


def test_output_combine_in_chain(tmp_path):
    """MultiStepSurfaceMetGan chain: the surface step's inferred
    input+output topo routing followed by a plain temporal GAN."""
    features = ['temperature_2m', 'relativehumidity_2m']
    input_file = make_fake_nc_file(
        str(tmp_path / 'met.nc'), (8, 8, 4), features)
    _, topo_file = _inputs(tmp_path)

    from sup3r_tpu.models import SurfaceSpatialMetModel

    surf = SurfaceSpatialMetModel(features, s_enhance=2)
    sdir = str(tmp_path / 'surf')
    surf.save(sdir)
    gen = [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': 4,
         'temporal_method': 'nearest'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv3D', 'filters': len(features),
         'kernel_size': 3, 'strides': 1, 'padding': 'same'},
    ]
    model = Sup3rGan(gen, _disc(is_5d=True))
    model.meta.update(
        lr_features=features, hr_out_features=features,
        s_enhance=1, t_enhance=4,
        input_resolution={'spatial': '6km', 'temporal': '60min'})
    model.set_norm_stats({f: 0.0 for f in features},
                         {f: 1.0 for f in features})
    model.init_weights((1, 8, 8, 2, len(features)),
                       (1, 8, 8, 8, len(features)))
    tdir = str(tmp_path / 'tgan')
    model.save(tdir)

    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='MultiStepSurfaceMetGan',
        model_kwargs={
            'surface_model_kwargs': {'model_dir': sdir},
            'temporal_model_kwargs': {'model_dirs': [tdir]}},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'topography': {
            'source_file': topo_file,
            'cache_dir': str(tmp_path / 'exo')}},
        out_pattern=None)
    steps = strategy.exo_data['topography']['steps']
    assert {(s['model'], s['combine_type']) for s in steps} == {
        (0, 'input'), (0, 'output')}
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (16, 16, 16, 2)
    assert np.isfinite(outputs[0]).all()


def test_obs_exo_in_chain(tmp_path):
    """Sparse-observation fusion on step 0 of a 2-step chain; the
    temporal step takes no exo (obs x multistep cell)."""
    input_file, _ = _inputs(tmp_path, shape=(10, 10, 4))
    obs_file = make_fake_h5_file(
        str(tmp_path / 'obs.h5'), (3, 3, 4), ['u_100m'],
        lat_range=(39.9, 39.2), lon_range=(-105.3, -104.5))
    gen = [
        {'class': 'Conv2D', 'filters': 32, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcatObs', 'name': 'u_100m_obs'},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    model = Sup3rGanWithObs(gen, _disc())
    model.meta.update(
        lr_features=FEATURES, hr_out_features=FEATURES,
        s_enhance=2, t_enhance=1,
        input_resolution={'spatial': '12km', 'temporal': '60min'})
    model.set_norm_stats({f: 0.0 for f in FEATURES},
                         {f: 1.0 for f in FEATURES})
    model.init_weights((1, 5, 5, 2), (1, 10, 10, 2))
    m1 = str(tmp_path / 'obs_model')
    model.save(m1)
    m2 = _temporal_gan(tmp_path, 'm2')

    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='MultiStepGan',
        model_kwargs={'model_dirs': [m1, m2]},
        fwp_chunk_shape=(10, 10, 4), spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'u_100m_obs': {
            'source_file': obs_file,
            'cache_dir': str(tmp_path / 'exo')}},
        out_pattern=None)
    steps = strategy.exo_data['u_100m_obs']['steps']
    assert {(s['model'], s['combine_type']) for s in steps} == {
        (0, 'layer')}
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (20, 20, 16, 2)
    assert np.isfinite(outputs[0]).all()


def test_sza_both_steps_of_chain(tmp_path):
    """sza consumed by BOTH the spatial and the temporal step —
    time-dependent exo must be enhanced per step (sza x multistep x
    both-steps cell)."""
    input_file, topo_file = _inputs(tmp_path)
    m1 = _spatial_topo_gan(tmp_path, 'm1', extra_exo_layer='sza')
    m2 = _temporal_gan(tmp_path, 'm2', sza_layer=True)
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='MultiStepGan',
        model_kwargs={'model_dirs': [m1, m2]},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={
            'topography': {'source_file': topo_file,
                           'cache_dir': str(tmp_path / 'exo')},
            'sza': {'cache_dir': str(tmp_path / 'exo')}},
        out_pattern=None)
    sza_steps = strategy.exo_data['sza']['steps']
    models = {s['model'] for s in sza_steps}
    assert models == {0, 1}
    # step-1 sza rasters ride the enhanced grid (2x space), and the
    # layer raster for the temporal model is also time-enhanced
    enh = {(s['model'], s['combine_type']):
           (s['s_enhance'], s['t_enhance']) for s in sza_steps}
    assert enh[(1, 'layer')] == (2, 4)
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (16, 16, 16, 2)
    assert np.isfinite(outputs[0]).all()


def test_three_step_chain_with_exoskip(tmp_path):
    """3-step chain (2x topo-spatial, 2x topo-spatial, 4x temporal):
    topo feeds steps 0 and 1 at compounding enhancement and SKIPS the
    temporal step (3-step x topo x skip cell; reference:
    test_forward_pass_exo.py:49-158 + 555-652)."""
    input_file, topo_file = _inputs(tmp_path)
    m1 = _spatial_topo_gan(tmp_path, 'm1')
    m2 = _spatial_topo_gan(tmp_path, 'm2')
    m3 = _temporal_gan(tmp_path, 'm3')
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='MultiStepGan',
        model_kwargs={'model_dirs': [m1, m2, m3]},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'topography': {
            'source_file': topo_file,
            'cache_dir': str(tmp_path / 'exo')}},
        out_pattern=None)
    steps = strategy.exo_data['topography']['steps']
    assert {s['model'] for s in steps} == {0, 1}
    enh = {(s['model'], s['combine_type']): s['s_enhance']
           for s in steps}
    assert enh == {(0, 'input'): 1, (0, 'layer'): 2,
                   (1, 'input'): 2, (1, 'layer'): 4}
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (32, 32, 16, 2)
    assert np.isfinite(outputs[0]).all()
