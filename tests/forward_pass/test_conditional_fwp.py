"""Conditional-moment model through the chunked forward pass
(reference: tests/forward_pass/test_conditional.py)."""

import numpy as np

from sup3r_tpu.models import Sup3rCondMom
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file

FEATURES = ['u_100m', 'v_100m']


def _cond_mom_model(tmp_path):
    gen = {'hidden_layers': [
        {'class': 'Conv2D', 'filters': 16, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SpatialExpansion', 'spatial_mult': 2},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'}]}
    model = Sup3rCondMom(gen, learning_rate=1e-4)
    model.meta.update(lr_features=FEATURES, hr_out_features=FEATURES,
                      s_enhance=2, t_enhance=1,
                      input_resolution={'spatial': '12km',
                                        'temporal': '60min'})
    model.set_norm_stats({f: 0.05 for f in FEATURES},
                         {f: 0.95 for f in FEATURES})
    model.init_weights((1, 6, 6, 2), (1, 12, 12, 2))
    d = str(tmp_path / 'mom1')
    model.save(d)
    return d


def test_cond_mom_forward_pass(tmp_path):
    """First-moment model runs through chunked inference with overlap
    stitching, matching the unchunked generate()."""
    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'), (12, 12, 4),
                                   ['u100', 'v100'])
    model_dir = _cond_mom_model(tmp_path)
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        model_class='Sup3rCondMom',
        fwp_chunk_shape=(12, 12, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None)
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (24, 24, 4, 2)
    assert np.isfinite(outputs[0]).all()

    model = Sup3rCondMom.load(model_dir)
    data = np.asarray(
        strategy.input_handler.data.as_array(FEATURES))
    direct = np.stack([
        model.generate(np.transpose(data[:, :, t:t + 1, :],
                                    (2, 0, 1, 3)))[0]
        for t in range(4)], axis=2)
    np.testing.assert_allclose(outputs[0], direct, rtol=1e-4,
                               atol=1e-5)
