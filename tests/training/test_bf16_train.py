"""Mixed-precision training flag (train_dtype='bfloat16'): fp32
master weights/optimizer with a bf16 network body. Convergence parity
vs fp32 on a tiny run — the correctness bar for the opt-in flag
(docs/PERFORMANCE.md carries the measured speed ablation)."""

import numpy as np

import sup3r_tpu.utilities.utilities as uu
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.preprocessing import BatchHandler, DataHandler
from sup3r_tpu.utilities.test_helpers import make_fake_h5_file

FEATURES = ['windspeed_100m', 'winddirection_100m']


def _reseed():
    uu.RANDOM_GENERATOR.bit_generator.state = np.random.default_rng(
        seed=77).bit_generator.state


def _gen():
    return [
        {'class': 'FlexiblePadding',
         'paddings': [[0, 0], [1, 1], [1, 1], [1, 1], [0, 0]],
         'mode': 'REFLECT'},
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': 2,
         'temporal_mult': 2, 'temporal_method': 'nearest'},
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]


def _disc():
    return [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]


def _train_once(path, dtype):
    _reseed()
    handler = DataHandler(path, features=FEATURES)
    bh = BatchHandler([handler], batch_size=4, n_batches=3,
                      s_enhance=2, t_enhance=2, sample_shape=(8, 8, 4),
                      max_workers=1)
    model = Sup3rGan(_gen(), _disc(), learning_rate=1e-3)
    model.train_dtype = dtype
    model.init_weights((1, 4, 4, 2, 2), (1, 8, 8, 4, 2), seed=5)
    model.train(bh, input_resolution={'spatial': '30km',
                                      'temporal': '60min'},
                n_epoch=2, out_dir=None)
    bh.stop()
    hist = model.history
    kern = next(p for p in model.gen_params if 'kernel' in p)
    return hist, np.asarray(kern['kernel'])


def test_bf16_train_converges_like_fp32(tmp_path):
    """Same data/seeds: the bf16-body run's loss trajectory tracks
    fp32 closely (bf16 has ~2^-8 relative rounding; the tiny net's
    losses agree to ~1e-3), master weights stay float32, and both
    runs optimize (loss decreases or stays finite)."""
    path = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (16, 16, 40), FEATURES,
        value_range=(0, 20))
    hist32, w32 = _train_once(path, None)
    hist16, w16 = _train_once(path, 'bfloat16')

    assert w16.dtype == np.float32
    for col in ('train_loss_gen', 'train_loss_disc'):
        a = hist32[col].to_numpy(dtype=float)
        b = hist16[col].to_numpy(dtype=float)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        np.testing.assert_allclose(b, a, rtol=0.05, atol=0.02)
    # the two runs genuinely took different compute paths
    assert not np.array_equal(w32, w16)
    # and end in nearby weight space (same trajectory, bf16 noise)
    np.testing.assert_allclose(w16, w32, rtol=0, atol=0.01)
