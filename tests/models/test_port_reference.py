"""Importing reference (phygnn/TF) model checkpoints: pickle parsing
with stubbed foreign classes, TF weight-layout conversion (incl.
conv-transpose flip+swap), norm stats, and output equivalence
(reference format: sup3r/models/base.py:133-197)."""

import json
import os
import pickle

import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.utilities.port import (
    import_phygnn_network,
    load_phygnn_pickle,
    load_reference_gan,
)

FEATURES = ['u_100m', 'v_100m']


def _gen_cfg():
    pad = {'class': 'FlexiblePadding',
           'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]],
           'mode': 'REFLECT'}
    return [
        dict(pad),
        {'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping2D', 'cropping': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv2DTranspose', 'filters': 8, 'kernel_size': 3,
         'strides': 1},
        {'class': 'SpatialExpansion', 'spatial_mult': 2},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]


def _disc_cfg():
    return [
        {'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
         'strides': 2, 'padding': 'same'},
        {'class': 'Flatten'}, {'class': 'Dense', 'units': 1},
    ]


def _to_tf_weights(net, params):
    """Export our params to the flat TF get_weights() layout."""
    out = []
    for p, lyr in zip(params, net.layers):
        if not (isinstance(p, dict) and 'kernel' in p):
            continue
        k = np.asarray(p['kernel'])
        if type(lyr).__name__ in ('Conv2DTranspose',
                                  'Conv3DTranspose'):
            # inverse of the import recipe
            k = np.swapaxes(k, -1, -2)
            k = np.flip(k, tuple(range(k.ndim - 2)))
        out.append(k)
        out.append(np.asarray(p['bias']))
    return out


def _write_reference_dir(tmp_path, model):
    """Fake a reference model directory from a sup3r_tpu model."""
    d = tmp_path / 'ref_model'
    os.makedirs(d, exist_ok=True)
    gen_w = _to_tf_weights(model.generator, model.gen_params)
    disc_w = _to_tf_weights(model.discriminator, model.disc_params)
    with open(d / 'model_gen.pkl', 'wb') as f:
        pickle.dump({'hidden_layers': _gen_cfg(), 'weights': gen_w,
                     'version_record': {'tensorflow': '2.x'}}, f)
    with open(d / 'model_disc.pkl', 'wb') as f:
        pickle.dump({'hidden_layers': _disc_cfg(), 'weights': disc_w},
                    f)
    with open(d / 'model_params.json', 'w') as f:
        json.dump({
            'name': 'fake_ref',
            'means': {k: 0.1 for k in FEATURES},
            'stdevs': {k: 2.0 for k in FEATURES},
            'meta': {'lr_features': FEATURES,
                     'hr_out_features': FEATURES,
                     's_enhance': 2, 't_enhance': 1,
                     'input_resolution': {'spatial': '12km',
                                          'temporal': '60min'}},
        }, f)
    return str(d)


@pytest.fixture
def source_model(tmp_path):
    model = Sup3rGan(_gen_cfg(), _disc_cfg())
    model.meta.update(lr_features=FEATURES, hr_out_features=FEATURES,
                      s_enhance=2, t_enhance=1)
    model.set_norm_stats({k: 0.1 for k in FEATURES},
                         {k: 2.0 for k in FEATURES})
    model.init_weights((1, 8, 8, 2), (1, 16, 16, 2))
    return model


def test_pickle_roundtrip(source_model, tmp_path):
    d = _write_reference_dir(tmp_path, source_model)
    cfg, weights = load_phygnn_pickle(os.path.join(d, 'model_gen.pkl'))
    assert cfg == _gen_cfg()
    assert len(weights) == 6  # 3 weighted layers x (kernel, bias)


def test_foreign_classes_are_stubbed(tmp_path):
    """Pickles containing phygnn/TF objects load without those
    packages installed."""

    import sys
    import types

    mod = types.ModuleType('phygnn')
    sub = types.ModuleType('phygnn.layers.handlers')

    class FakeLayersObj:
        pass

    FakeLayersObj.__module__ = 'phygnn.layers.handlers'
    FakeLayersObj.__qualname__ = 'FakeLayersObj'
    sub.FakeLayersObj = FakeLayersObj
    obj = FakeLayersObj()
    obj.junk = 'x'
    payload = {'hidden_layers': [{'class': 'Dense', 'units': 1}],
               'weights': [np.ones((3, 1), np.float32),
                           np.zeros(1, np.float32)],
               'layers_obj': obj}
    fp = str(tmp_path / 'gen.pkl')
    sys.modules['phygnn'] = mod
    sys.modules['phygnn.layers.handlers'] = sub
    try:
        with open(fp, 'wb') as f:
            pickle.dump(payload, f)
    finally:
        del sys.modules['phygnn']
        del sys.modules['phygnn.layers.handlers']
    # loading happens WITHOUT phygnn importable
    cfg, weights = load_phygnn_pickle(fp)
    assert cfg[0]['class'] == 'Dense'
    assert len(weights) == 2


def test_import_network_output_matches(source_model, tmp_path):
    """TF-layout round trip: exported weights re-imported produce the
    SAME generator params and outputs."""
    import jax.numpy as jnp

    gen_w = _to_tf_weights(source_model.generator,
                           source_model.gen_params)
    net, params = import_phygnn_network(_gen_cfg(), gen_w,
                                        (1, 8, 8, 2))
    x = jnp.asarray(np.random.default_rng(0).random(
        (1, 8, 8, 2)), dtype=jnp.float32)
    a = source_model.generator.apply(source_model.gen_params, x)
    b = net.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6)


def test_load_reference_gan_end_to_end(source_model, tmp_path):
    d = _write_reference_dir(tmp_path, source_model)
    model = load_reference_gan(d, lr_shape=(1, 8, 8, 2))
    assert model.s_enhance == 2
    assert model.lr_features == FEATURES
    lr = np.random.default_rng(1).random((1, 8, 8, 2)).astype(
        np.float32)
    a = source_model.generate(lr)
    b = model.generate(lr)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_partial_norm_stats_still_load(source_model, tmp_path):
    """model_params.json with means populated but stdevs null must
    still load the means (set_norm_stats handles per-argument None);
    gating on both would silently generate on un-normalized input."""
    d = _write_reference_dir(tmp_path, source_model)
    fp = os.path.join(d, 'model_params.json')
    with open(fp) as f:
        params = json.load(f)
    params['stdevs'] = None
    with open(fp, 'w') as f:
        json.dump(params, f)
    model = load_reference_gan(d, lr_shape=(1, 8, 8, 2))
    assert model._means == {k: 0.1 for k in FEATURES}
    assert model._stdevs is None


def test_shape_mismatch_raises(source_model, tmp_path):
    gen_w = _to_tf_weights(source_model.generator,
                           source_model.gen_params)
    gen_w[0] = gen_w[0][:, :, :1, :]  # corrupt a kernel
    with pytest.raises(ValueError, match='kernel shape'):
        import_phygnn_network(_gen_cfg(), gen_w, (1, 8, 8, 2))


def test_not_a_model_pickle_raises(tmp_path):
    fp = str(tmp_path / 'junk.pkl')
    with open(fp, 'wb') as f:
        pickle.dump({'something': 1}, f)
    with pytest.raises(ValueError, match='hidden_layers'):
        load_phygnn_pickle(fp)


def test_export_then_import_roundtrip(source_model, tmp_path):
    """export_reference_gan -> load_reference_gan reproduces the model
    exactly (the symmetric migration path)."""
    from sup3r_tpu.utilities.port import export_reference_gan

    d = str(tmp_path / 'exported')
    export_reference_gan(source_model, d)
    assert os.path.exists(os.path.join(d, 'model_gen.pkl'))
    assert os.path.exists(os.path.join(d, 'model_disc.pkl'))
    loaded = load_reference_gan(d, lr_shape=(1, 8, 8, 2))
    lr = np.random.default_rng(5).random((1, 8, 8, 2)).astype(
        np.float32)
    np.testing.assert_allclose(loaded.generate(lr),
                               source_model.generate(lr),
                               rtol=1e-5, atol=1e-6)


def test_import_model_cli(source_model, tmp_path):
    """sup3r-tpu import-model converts a reference dir into a loadable
    sup3r_tpu model directory."""
    from click.testing import CliRunner

    from sup3r_tpu.cli import main

    ref_dir = _write_reference_dir(tmp_path, source_model)
    out_dir = str(tmp_path / 'converted')
    runner = CliRunner()
    result = runner.invoke(main, ['import-model', ref_dir, out_dir,
                                  '--lr-shape', '1,8,8,2'], obj={})
    assert result.exit_code == 0, result.output
    loaded = Sup3rGan.load(out_dir)
    lr = np.random.default_rng(9).random((1, 8, 8, 2)).astype(
        np.float32)
    np.testing.assert_allclose(loaded.generate(lr),
                               source_model.generate(lr),
                               rtol=1e-5, atol=1e-6)


def test_import_model_cli_multistep_bundle(source_model, tmp_path):
    """A bundle of per-step reference dirs converts step by step and
    loads as a MultiStepGan."""
    import shutil

    from click.testing import CliRunner

    from sup3r_tpu.cli import main
    from sup3r_tpu.models import MultiStepGan

    ref = _write_reference_dir(tmp_path, source_model)
    bundle = tmp_path / 'bundle'
    for step in ('model_step_0', 'model_step_1'):
        shutil.copytree(ref, bundle / step)
    out_dir = str(tmp_path / 'converted_bundle')
    runner = CliRunner()
    result = runner.invoke(main, ['import-model', str(bundle), out_dir,
                                  '--lr-shape', '1,8,8,2'], obj={})
    assert result.exit_code == 0, result.output
    ms = MultiStepGan.load([os.path.join(out_dir, 'model_step_0'),
                            os.path.join(out_dir, 'model_step_1')])
    assert ms.s_enhance == 4
    lr = np.random.default_rng(11).random((1, 8, 8, 2)).astype(
        np.float32)
    out = ms.generate(lr)
    # the chain equals two manual source-model applications (the test
    # generator isn't a clean 2x — convT VALID adds pixels)
    manual = source_model.generate(source_model.generate(lr))
    np.testing.assert_allclose(out, manual, rtol=1e-5, atol=1e-6)
