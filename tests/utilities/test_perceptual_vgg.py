"""PerceptualLoss VGG16 weight-import path: maps external VGG16 conv
weights onto the extractor so reference PerceptualLoss runs are
numerically reproducible when weights are available (reference:
sup3r/utilities/loss_metrics.py:641-723)."""

import numpy as np
import pytest

from sup3r_tpu.ops.losses import (
    _VGG16_MEANS,
    PerceptualLoss,
    get_loss_fun,
)

RNG = np.random.default_rng(0)


def _fake_vgg_npz(tmp_path, through_block=2, sep='/'):
    """Small-channel fake VGG16 weights with the real layer names."""
    channels = {1: 8, 2: 12, 3: 16, 4: 16, 5: 16}
    n_convs = {1: 2, 2: 2, 3: 3, 4: 3, 5: 3}
    arrs = {}
    c_in = 3
    for b in range(1, through_block + 1):
        for c in range(1, n_convs[b] + 1):
            c_out = channels[b]
            name = f'block{b}_conv{c}'
            arrs[f'{name}{sep}kernel'] = RNG.standard_normal(
                (3, 3, c_in, c_out)).astype(np.float32) * 0.05
            arrs[f'{name}{sep}bias'] = RNG.standard_normal(
                c_out).astype(np.float32) * 0.01
            c_in = c_out
    fp = str(tmp_path / 'vgg16.npz')
    np.savez(fp, **arrs)
    return fp


def test_vgg_loss_basic(tmp_path):
    fp = _fake_vgg_npz(tmp_path)
    loss = PerceptualLoss(weights=fp)
    x = RNG.random((2, 12, 12, 2)).astype(np.float32)
    y = RNG.random((2, 12, 12, 2)).astype(np.float32)
    assert float(loss(x, x)) == 0.0
    v = float(loss(x, y))
    assert np.isfinite(v) and v > 0
    # 5D input works too
    x5 = RNG.random((2, 12, 12, 4, 2)).astype(np.float32)
    y5 = RNG.random((2, 12, 12, 4, 2)).astype(np.float32)
    assert np.isfinite(float(loss(x5, y5)))


def test_vgg_single_conv_numerics(tmp_path):
    """layer_names=['block1_conv1'] reproduces a hand-computed SAME
    conv + bias + relu on mean-subtracted replicated-gray input."""
    fp = _fake_vgg_npz(tmp_path, through_block=1)
    with np.load(fp) as f:
        k = f['block1_conv1/kernel']
        b = f['block1_conv1/bias']
    loss = PerceptualLoss(weights=fp, layer_names=['block1_conv1'])
    x = RNG.random((1, 6, 6, 1)).astype(np.float32) * 10
    y = np.zeros((1, 6, 6, 1), np.float32)

    def extract(img):
        gray = np.repeat(img, 3, axis=-1) - _VGG16_MEANS
        padded = np.pad(gray, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = np.zeros((1, 6, 6, k.shape[-1]), np.float32)
        for i in range(6):
            for j in range(6):
                win = padded[0, i:i + 3, j:j + 3, :]
                out[0, i, j] = np.tensordot(win, k, axes=3) + b
        return np.maximum(out, 0)

    expected = np.mean((extract(x) - extract(y)) ** 2)
    got = float(loss(x, y))
    np.testing.assert_allclose(got, expected, rtol=2e-5)


def test_vgg_layer_routing(tmp_path):
    """Deeper layer_names pull through pools; feature maps halve."""
    fp = _fake_vgg_npz(tmp_path, through_block=3)
    loss = PerceptualLoss(
        weights=fp, layer_names=['block1_conv2', 'block3_conv3'])
    x = RNG.random((1, 16, 16, 3)).astype(np.float32)
    fmaps = loss._feature_maps(np.repeat(x[..., :1], 3, axis=-1))
    assert fmaps[0].shape == (1, 16, 16, 8)
    assert fmaps[1].shape == (1, 4, 4, 16)


def test_vgg_error_paths(tmp_path):
    fp = _fake_vgg_npz(tmp_path, through_block=1)
    with pytest.raises(ValueError, match='lacks layers'):
        PerceptualLoss(weights=fp,
                       layer_names=['block1_conv2', 'block2_conv2'])
    with pytest.raises(ValueError, match='Unknown VGG16'):
        PerceptualLoss(weights=fp, layer_names=['not_a_layer'])


def test_vgg_underscore_keys_and_registry(tmp_path):
    """'<layer>_kernel' key spelling and get_loss_fun dict spec."""
    fp = _fake_vgg_npz(tmp_path, sep='_')
    fn = get_loss_fun({'PerceptualLoss': {'weights': fp}})
    x = RNG.random((1, 8, 8, 1)).astype(np.float32)
    y = RNG.random((1, 8, 8, 1)).astype(np.float32)
    assert np.isfinite(float(fn(x, y)))


def test_random_default_unchanged():
    """No weights arg -> the committed random-projection checkpoint
    (the offline default) still drives the loss."""
    loss = PerceptualLoss()
    assert loss._vgg is None
    x = RNG.random((1, 8, 8, 1)).astype(np.float32)
    y = RNG.random((1, 8, 8, 1)).astype(np.float32)
    a = float(loss(x, y))
    b = float(PerceptualLoss()(x, y))
    assert a == b > 0


def test_vgg_5d_uses_reference_raw_reshape(tmp_path):
    """Weights mode flattens 5D with the reference's RAW reshape
    (loss value parity; reference: loss_metrics.py:701-710), not the
    time-batched moveaxis the offline extractor uses."""
    import jax.numpy as jnp

    fp = _fake_vgg_npz(tmp_path, through_block=1)
    loss = PerceptualLoss(weights=fp, layer_names=['block1_conv2'])
    x5 = RNG.random((2, 6, 6, 3, 1)).astype(np.float32)
    y5 = RNG.random((2, 6, 6, 3, 1)).astype(np.float32)
    got = float(loss(x5, y5))
    raw_x = np.reshape(x5, (6, 6, 6, 1))
    raw_y = np.reshape(y5, (6, 6, 6, 1))
    expected = float(loss(raw_x, raw_y))
    assert got == expected
    moved = float(loss(
        np.reshape(np.moveaxis(x5, 3, 1), (6, 6, 6, 1)),
        np.reshape(np.moveaxis(y5, 3, 1), (6, 6, 6, 1))))
    assert got != moved  # the two flattenings genuinely differ
