"""Process-level model cache in ForwardPassStrategy.get_model:
repeated strategy/ForwardPass construction in one process must reuse
ONE model instance (fresh instances carry cold per-instance jit caches
— on the tunneled TPU every reload cost seconds per compiled program,
the round-4 E2E bench regression), while a re-saved checkpoint must
invalidate the cache via the file fingerprint.
"""

import os
import time

import numpy as np

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPassStrategy
from sup3r_tpu.pipeline.strategy import _MODEL_CACHE
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file

FEATURES = ['u_100m', 'v_100m']


def _save_model(tmp_path, seed=0):
    gen = [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 1,
         'strides': 1},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': 2,
         'temporal_method': 'nearest'},
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 1,
         'strides': 1},
    ]
    disc = [{'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'LeakyReLU', 'alpha': 0.2},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(
        lr_features=FEATURES, hr_out_features=FEATURES,
        s_enhance=1, t_enhance=2,
        input_resolution={'spatial': '12km', 'temporal': '60min'})
    model.set_norm_stats({f: 0.0 for f in FEATURES},
                         {f: 1.0 for f in FEATURES})
    model.init_weights((1, 6, 6, 4, 2), (1, 6, 6, 8, 2), seed=seed)
    out_dir = os.path.join(tmp_path, 'model')
    model.save(out_dir)
    return out_dir


def _strategy(input_file, model_dir, tmp_path, mode='exact'):
    return ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=1, temporal_pad=1,
        out_pattern=str(tmp_path / 'out' / 'chunk_{file_id}.h5'),
        inference_mode=mode)


def test_model_cache_reuses_instance(tmp_path):
    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'), (8, 8, 8),
                                   ['u100', 'v100'])
    model_dir = _save_model(tmp_path)
    s1 = _strategy(input_file, model_dir, tmp_path)
    s2 = _strategy(input_file, model_dir, tmp_path)
    m1, m2 = s1.get_model(), s2.get_model()
    assert m1 is m2

    # a fast-mode strategy gets its OWN instance (the mode is part of
    # the cache identity): concurrent exact + fast strategies in one
    # process must not race on one instance's mutable flags
    sf = _strategy(input_file, model_dir, tmp_path, mode='fast')
    mf = sf.get_model()
    assert mf is not m1 and mf.inference_mode == 'fast'
    m3 = _strategy(input_file, model_dir, tmp_path).get_model()
    assert m3 is m1 and m3.inference_mode == 'exact'
    # and the fast instance is itself cached/reused
    assert _strategy(input_file, model_dir, tmp_path,
                     mode='fast').get_model() is mf


def test_model_cache_invalidated_by_resave(tmp_path):
    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'), (8, 8, 8),
                                   ['u100', 'v100'])
    model_dir = _save_model(tmp_path)
    m1 = _strategy(input_file, model_dir, tmp_path).get_model()

    # re-save different weights into the SAME dir; bump mtimes past
    # filesystem timestamp granularity
    time.sleep(0.05)
    _save_model(tmp_path, seed=1)
    for root, _, files in os.walk(model_dir):
        for f in files:
            os.utime(os.path.join(root, f))
    n_before = len(_MODEL_CACHE)
    m2 = _strategy(input_file, model_dir, tmp_path).get_model()
    assert m2 is not m1
    # the stale entry was REPLACED, not retained next to the new one
    # (each cached model pins params in memory)
    assert len(_MODEL_CACHE) == n_before
    assert not any(entry[1] is m1 for entry in _MODEL_CACHE.values())
    w1 = np.asarray(next(iter(
        m1.gen_params[0].values() if isinstance(m1.gen_params[0], dict)
        else [m1.gen_params[0]])))
    w2 = np.asarray(next(iter(
        m2.gen_params[0].values() if isinstance(m2.gen_params[0], dict)
        else [m2.gen_params[0]])))
    assert w1.shape == w2.shape
    assert not np.allclose(w1, w2)


def test_model_cache_multi_slot_fused_apply(tmp_path):
    """Alternating exact/fast on one cached instance keeps BOTH fused
    programs cached (single-slot thrash rebuilt + re-jitted per
    switch)."""
    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'), (8, 8, 8),
                                   ['u100', 'v100'])
    model_dir = _save_model(tmp_path)
    m = _strategy(input_file, model_dir, tmp_path).get_model()
    m.inference_mode = 'exact'
    f_exact, _ = m._get_fused_apply()
    m.inference_mode = 'fast'
    f_fast, _ = m._get_fused_apply()
    m.inference_mode = 'exact'
    f_exact2, _ = m._get_fused_apply()
    assert f_exact2 is f_exact
    assert f_fast is not f_exact
    _MODEL_CACHE.clear()
