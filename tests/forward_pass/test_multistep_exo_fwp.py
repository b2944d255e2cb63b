"""Multi-step forward pass with per-step topography exo routing
(mirrors reference tests/forward_pass/test_forward_pass_exo.py)."""

import h5py
import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)


def _gan_with_topo(tmp_path, name, s_enhance, is_5d, features):
    """Spatial or ST GAN with a mid-network Sup3rConcat topography."""
    conv = 'Conv3D' if is_5d else 'Conv2D'
    expand = ({'class': 'SpatioTemporalExpansion',
               'spatial_mult': s_enhance}
              if is_5d else
              {'class': 'SpatialExpansion', 'spatial_mult': s_enhance})
    gen = [
        {'class': conv, 'filters': 8 * s_enhance * s_enhance,
         'kernel_size': 3, 'strides': 1, 'padding': 'same'},
        expand,
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcat', 'name': 'topography'},
        {'class': conv, 'filters': len(features), 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': conv, 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(
        lr_features=[*features, 'topography'],
        hr_out_features=features, s_enhance=s_enhance, t_enhance=1,
        input_resolution={'spatial': '12km', 'temporal': '60min'})
    stats = {f: 0.0 for f in [*features, 'topography']}
    model.set_norm_stats(stats, {k: 1.0 for k in stats})
    shape = ((1, 4, 4, 2, len(features) + 1) if is_5d
             else (1, 4, 4, len(features) + 1))
    hr = ((1, 4 * s_enhance, 4 * s_enhance, 2, len(features))
          if is_5d else
          (1, 4 * s_enhance, 4 * s_enhance, len(features)))
    model.init_weights(shape, hr)
    d = str(tmp_path / name)
    model.save(d)
    return d


def test_multistep_fwp_with_exo_both_steps(tmp_path):
    """2-step (2x then 2x) chain where BOTH steps take topography as
    an input channel + mid-network layer, rasters at each enhanced
    resolution routed via ExoData step splitting."""
    features = ['u_100m', 'v_100m']
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (8, 8, 4), ['u100', 'v100'])
    topo_file = make_fake_h5_file(
        str(tmp_path / 'topo.h5'), (40, 40, 2), ['windspeed_10m'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1))
    m1 = _gan_with_topo(tmp_path, 'm1', 2, False, features)
    m2 = _gan_with_topo(tmp_path, 'm2', 2, False, features)

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
    # input+layer for model 0 and input+layer for model 1
    combos = [(s['model'], s['combine_type']) for s in steps]
    assert (0, 'input') in combos and (0, 'layer') in combos
    assert (1, 'input') in combos and (1, 'layer') in combos
    enhances = {(s['model'], s['combine_type']): s['s_enhance']
                for s in steps}
    assert enhances[(0, 'input')] == 1
    assert enhances[(0, 'layer')] == 2
    assert enhances[(1, 'input')] == 2
    assert enhances[(1, 'layer')] == 4

    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (32, 32, 4, 2)
    assert np.isfinite(outputs[0]).all()
