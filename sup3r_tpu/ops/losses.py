"""Content-loss library (pure JAX, all jittable and differentiable).

Every loss is a plain function ``loss(x1, x2) -> scalar`` (synthetic
first, ground truth second) resolved by name via :func:`get_loss_fun`.
Batches are feature-last: 4D ``(n, s1, s2, f)`` spatial or 5D
``(n, s1, s2, t, f)`` spatiotemporal.

Reference parity: sup3r/utilities/loss_metrics.py (ExpLoss :97, MmdLoss
:121, MaterialDerivativeLoss :150, Spatial/TemporalDerivativeLoss
:228/:263, CoarseMseLoss :297, Spatial/TemporalExtremesLoss :325/:360,
Spatial/SpatiotemporalFftLoss :395/:440, LowResLoss :488, PerceptualLoss
:641, SlicedWassersteinLoss :724) and the name-based resolution in
sup3r/models/abstract.py:461-541.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def mae(x1, x2):
    """Mean absolute error."""
    return jnp.mean(jnp.abs(x1 - x2))


def mse(x1, x2):
    """Mean squared error."""
    return jnp.mean((x1 - x2) ** 2)


def _central_diff(x, axis):
    """np.gradient-style central difference along ``axis`` (one-sided at
    the boundaries)."""

    def sl(start, stop):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, stop)
        return tuple(idx)

    first = x[sl(1, 2)] - x[sl(0, 1)]
    mid = (x[sl(2, None)] - x[sl(None, -2)]) / 2
    last = x[sl(-1, None)] - x[sl(-2, -1)]
    return jnp.concatenate([first, mid, last], axis=axis)


def exp_loss(x1, x2):
    """Squared-exponential difference: mean(1 - exp(-(x1-x2)^2))."""
    return jnp.mean(1 - jnp.exp(-((x1 - x2) ** 2)))


def _gaussian_kernel_mean(x1, x2, sigma=1.0):
    """mean_{i,j} exp(-0.5 * ||x1_i - x2_j||^2 / sigma^2) comparing every
    observation to every other observation over the last axis."""
    sq = jnp.sum((x1[:, None] - x2[None]) ** 2, axis=-1)
    return jnp.mean(jnp.exp(-0.5 * sq / sigma**2))


def mmd_loss(x1, x2, sigma=1.0):
    """Maximum mean discrepancy with a gaussian kernel."""
    return (
        _gaussian_kernel_mean(x1, x1, sigma)
        + _gaussian_kernel_mean(x2, x2, sigma)
        - 2 * _gaussian_kernel_mean(x1, x2, sigma)
    )


def mmd_mse_loss(x1, x2, sigma=1.0):
    """MMD + MSE combination."""
    return mmd_loss(x1, x2, sigma=sigma) + mse(x1, x2)


def _material_derivative(x, fidx):
    """Df/Dt = df/dt + u df/dx + v df/dy for feature channel ``fidx``,
    assuming channels 2k/2k+1 hold the u/v pair for channel pair k."""
    uidx = 2 * (fidx // 2)
    vidx = uidx + 1
    md = _central_diff(x[..., fidx], axis=3)
    md += x[..., uidx] * _central_diff(x[..., fidx], axis=1)
    md += x[..., vidx] * _central_diff(x[..., fidx], axis=2)
    return md


def material_derivative_loss(x1, x2):
    """MAE between material derivatives of u channels (5D only)."""
    assert x1.ndim == 5 and x2.ndim == 5, (
        'MaterialDerivativeLoss requires 5D spatiotemporal tensors')
    n_pairs = x1.shape[-1] // 2
    x1_md = jnp.stack(
        [_material_derivative(x1, 2 * i) for i in range(n_pairs)])
    x2_md = jnp.stack(
        [_material_derivative(x2, 2 * i) for i in range(n_pairs)])
    return mae(x1_md, x2_md)


def spatial_derivative_loss(x1, x2):
    """MAE of summed spatial central differences (>=4D)."""
    assert x1.ndim >= 4 and x2.ndim >= 4
    d1 = _central_diff(x1, 1) + _central_diff(x1, 2)
    d2 = _central_diff(x2, 1) + _central_diff(x2, 2)
    return mae(d1, d2)


def temporal_derivative_loss(x1, x2):
    """MAE of temporal central differences (5D only)."""
    assert x1.ndim == 5 and x2.ndim == 5
    return mae(_central_diff(x1, 3), _central_diff(x2, 3))


def coarse_mse_loss(x1, x2):
    """MSE of spatial means (full spatial collapse)."""
    return mse(jnp.mean(x1, axis=(1, 2)), jnp.mean(x2, axis=(1, 2)))


def spatial_extremes_loss(x1, x2):
    """Mean of MAE on spatial minima and spatial maxima."""
    mae_min = mae(jnp.min(x1, axis=(1, 2)), jnp.min(x2, axis=(1, 2)))
    mae_max = mae(jnp.max(x1, axis=(1, 2)), jnp.max(x2, axis=(1, 2)))
    return (mae_min + mae_max) / 2


def temporal_extremes_loss(x1, x2):
    """Mean of MAE on temporal minima and maxima (5D, time axis=3)."""
    mae_min = mae(jnp.min(x1, axis=3), jnp.min(x2, axis=3))
    mae_max = mae(jnp.max(x1, axis=3), jnp.max(x2, axis=3))
    return (mae_min + mae_max) / 2


def spatial_extremes_only_loss(x1, x2):
    """Alias used by some reference configs."""
    return spatial_extremes_loss(x1, x2)


def temporal_extremes_only_loss(x1, x2):
    """Alias used by some reference configs."""
    return temporal_extremes_loss(x1, x2)


def _freq_weights(shape_st):
    """Outer product of squared wavenumbers for the given spatial(-temporal)
    shape, used to emphasize high frequencies."""
    grids = [np.arange(n) ** 2 for n in shape_st]
    w = functools.reduce(np.multiply.outer, grids)
    return jnp.asarray(w[np.newaxis, ..., np.newaxis], dtype=jnp.float32)


def spatial_fft_loss(x1, x2):
    """MAE of log(1 + k^2-weighted |FFT2|) over spatial dims (4D)."""

    def spec(x):
        xh = jnp.abs(jnp.fft.fft2(x.astype(jnp.complex64), axes=(1, 2)))
        xh = xh.astype(x.dtype) * _freq_weights(x.shape[1:3])
        return jnp.log1p(xh)

    return mae(spec(x1), spec(x2))


def spatiotemporal_fft_loss(x1, x2):
    """MAE of log(1 + weighted |FFT3|) over space+time dims (5D)."""

    def spec(x):
        xh = jnp.abs(jnp.fft.fftn(x.astype(jnp.complex64), axes=(1, 2, 3)))
        xh = xh.astype(x.dtype) * _freq_weights(x.shape[1:4])
        return jnp.log1p(xh)

    return mae(spec(x1), spec(x2))


class LowResLoss:
    """Pointwise loss on re-coarsened (synthetic, true) high-res pairs.

    Reference parity: sup3r/utilities/loss_metrics.py:488-640.
    """

    EX_LOSSES = {
        'SpatialExtremesLoss': spatial_extremes_loss,
        'TemporalExtremesLoss': temporal_extremes_loss,
    }
    PW_LOSSES = {
        'MeanSquaredError': mse,
        'MeanAbsoluteError': mae,
    }

    def __init__(self, s_enhance=1, t_enhance=1, t_method='average',
                 tf_loss='MeanSquaredError', ex_loss=None):
        self._s = s_enhance
        self._t = t_enhance
        self._t_method = str(t_method).casefold()
        # the reference (loss_metrics.py:633-640) matches t_method
        # against exactly 'average'/'subsample' and SILENTLY applies no
        # temporal coarsening otherwise — a config typo ('mean', 'avg')
        # would train against a different loss surface with no signal.
        # Validate up front instead.
        if self._t > 1 and self._t_method not in ('average', 'subsample'):
            raise ValueError(
                f'LowResLoss t_method="{t_method}" is not a valid '
                'option; must be "average" or "subsample"')
        self._pw = self.PW_LOSSES[tf_loss]
        self._ex = self.EX_LOSSES[ex_loss] if ex_loss else None

    def _coarsen(self, x):
        if self._s > 1:
            n = x.shape[0]
            s1, s2 = x.shape[1], x.shape[2]
            trail = x.shape[3:]
            x = jnp.reshape(
                x, (n, s1 // self._s, self._s, s2 // self._s, self._s,
                    *trail))
            x = jnp.sum(x, axis=(2, 4)) / self._s**2
        if self._t > 1:
            if x.ndim != 5:
                # the reference fails loudly here too (assert 5D in
                # _t_coarsen_avg; 5-index slice in _t_coarsen_sample)
                raise ValueError(
                    'LowResLoss with t_enhance > 1 needs 5D '
                    f'(n, s1, s2, t, f) tensors, got shape {x.shape}')
            if self._t_method == 'subsample':
                x = x[:, :, :, ::self._t, :]
            else:
                n, s1, s2, t, f = x.shape
                x = jnp.reshape(x, (n, s1, s2, t // self._t, self._t, f))
                x = jnp.sum(x, axis=4) / self._t
        return x

    def __call__(self, x1, x2):
        assert x1.shape == x2.shape
        ex = self._ex(x1, x2) if self._ex is not None else 0.0
        return self._pw(self._coarsen(x1), self._coarsen(x2)) + ex


class SlicedWassersteinLoss:
    """Sliced Wasserstein distance via sorted random 1D projections.

    The reference redraws projection directions every call
    (sup3r/utilities/loss_metrics.py:724 ``tf.random.normal`` inside
    ``__call__``). Under jit that is expressed functionally: callers
    that thread a PRNG ``key`` (the fused train step folds the step
    counter into it) get fresh projections per call — same
    distribution as the reference. With ``key=None`` the instance
    seed is used, giving a deterministic (fixed-projection) loss for
    standalone evaluation.
    """

    needs_key = True

    def __init__(self, n_projections=1024, seed=0):
        self._n_projections = n_projections
        self._seed = seed

    def __call__(self, x1, x2, key=None):
        assert x1.ndim in (4, 5), 'SWL needs 4D or 5D tensors'
        if x1.ndim == 4:
            x1 = x1[:, :, :, None, :]
            x2 = x2[:, :, :, None, :]
        b, h, w, t, c = x1.shape
        hwt = h * w * t
        x1f = jnp.reshape(x1, (b, hwt, c))
        x2f = jnp.reshape(x2, (b, hwt, c))
        if key is None:
            key = jax.random.PRNGKey(self._seed)
        else:
            key = jax.random.fold_in(key, self._seed)
        proj = jax.random.normal(
            key, (self._n_projections, hwt), dtype=x1.dtype)
        proj = proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)
        p1 = jnp.einsum('ph,bhc->bpc', proj, x1f)
        p2 = jnp.einsum('ph,bhc->bpc', proj, x2f)
        return jnp.mean((jnp.sort(p1, axis=1) - jnp.sort(p2, axis=1)) ** 2)


def apply_loss(loss_fun, x1, x2, key=None):
    """Call ``loss_fun(x1, x2)``, threading ``key`` only to losses
    that declare ``needs_key`` (per-call randomized losses like
    :class:`SlicedWassersteinLoss`)."""
    if getattr(loss_fun, 'needs_key', False):
        return loss_fun(x1, x2, key=key)
    return loss_fun(x1, x2)


#: VGG16 feature-trunk topology (layer name order and pool placement;
#: channel counts come from the imported weights themselves).
#: Reference: keras.applications.VGG16, used at
#: sup3r/utilities/loss_metrics.py:656.
_VGG16_TOPOLOGY = (
    'block1_conv1', 'block1_conv2', 'block1_pool',
    'block2_conv1', 'block2_conv2', 'block2_pool',
    'block3_conv1', 'block3_conv2', 'block3_conv3', 'block3_pool',
    'block4_conv1', 'block4_conv2', 'block4_conv3', 'block4_pool',
    'block5_conv1', 'block5_conv2', 'block5_conv3', 'block5_pool',
)

#: keras.applications.vgg16.preprocess_input 'caffe' channel means;
#: the inputs are grayscale-replicated to 3 channels so the RGB->BGR
#: flip is a no-op and only the per-channel mean subtraction matters.
_VGG16_MEANS = np.array([103.939, 116.779, 123.68], dtype=np.float32)


class PerceptualLoss:
    """Feature-map MSE, either with imported VGG16 weights (the
    reference's exact loss surface) or a FIXED random-projection
    extractor (the offline default).

    The reference computes MSE between pretrained-VGG16 feature maps
    (reference: sup3r/utilities/loss_metrics.py:641-723). Pass
    ``weights='/path/to/vgg16.npz'`` to reproduce it numerically: the
    file maps ``<layer>/kernel`` / ``<layer>/bias`` (or
    ``<layer>_kernel``/``_bias``) HWIO conv weights onto the VGG16
    trunk, features are extracted at ``layer_names`` (default
    ``['block1_conv2', 'block2_conv2']``) after caffe-style
    ``preprocess_input`` mean subtraction; 5D batches flatten with
    the reference's raw reshape so the loss value matches exactly
    (the offline random extractor instead batches time frames
    properly). Export recipe from any machine with Keras::

        vgg = keras.applications.VGG16(weights='imagenet',
                                       include_top=False)
        arrs = {}
        for lyr in vgg.layers:
            if 'conv' in lyr.name:
                k, b = lyr.get_weights()
                arrs[f'{lyr.name}/kernel'] = k
                arrs[f'{lyr.name}/bias'] = b
        np.savez('vgg16.npz', **arrs)

    Without ``weights``, frozen random-projection conv filters are
    used — random projections preserve feature-map geometry
    (Johnson-Lindenstrauss) and are a standard offline stand-in; that
    is a DIFFERENT loss surface than VGG's, documented as such.

    Determinism: the default filters are a committed, versioned
    checkpoint (``perceptual_v1.npz``) loaded from disk, so the loss
    value is identical across processes, machines, and library
    versions. Non-default ``n_filters``/``seed`` regenerate filters
    with numpy's PCG64 (also cross-platform deterministic).
    """

    WEIGHTS_V1 = os.path.join(os.path.dirname(__file__),
                              'perceptual_v1.npz')

    @staticmethod
    def make_kernels(n_filters=(64, 128), seed=0):
        """Generate the frozen extractor kernels (numpy PCG64 —
        bit-stable across platforms and processes)."""
        rng = np.random.default_rng(seed)
        kernels, c_in = [], 3
        for c_out in n_filters:
            k = rng.standard_normal(
                (3, 3, c_in, c_out)).astype(np.float32)
            kernels.append(k / np.sqrt(9 * c_in).astype(np.float32))
            c_in = c_out
        return kernels

    @classmethod
    def _load_vgg_weights(cls, weights):
        """{layer: (kernel, bias)} from an npz/dict of VGG16 conv
        weights; accepts '<layer>/kernel' or '<layer>_kernel' keys."""
        if isinstance(weights, str):
            with np.load(weights) as f:
                raw = {k: np.asarray(f[k]) for k in f.files}
        else:
            raw = {k: np.asarray(v) for k, v in dict(weights).items()}
        out = {}
        for key, val in raw.items():
            norm = key.replace('/', '_')
            for suffix in ('_kernel', '_bias'):
                if norm.endswith(suffix):
                    layer = norm[: -len(suffix)]
                    out.setdefault(layer, [None, None])
                    out[layer][suffix == '_bias'] = val.astype(
                        np.float32)
        missing = [k for k, v in out.items() if v[0] is None]
        if missing:
            raise ValueError(
                f'VGG16 weights missing kernels for {missing}')
        return {k: (v[0], v[1] if v[1] is not None
                    else np.zeros(v[0].shape[-1], np.float32))
                for k, v in out.items()}

    def __init__(self, layer_names=None, n_filters=(64, 128), seed=0,
                 weights=None):
        self.layer_names = (list(layer_names) if layer_names is not None
                            else ['block1_conv2', 'block2_conv2'])
        self._vgg = None
        if weights is not None:
            vgg = self._load_vgg_weights(weights)
            unknown = [n for n in self.layer_names
                       if n not in _VGG16_TOPOLOGY]
            if unknown:
                raise ValueError(
                    f'Unknown VGG16 layer_names {unknown}; expected '
                    f'among {[n for n in _VGG16_TOPOLOGY]}')
            deepest = max(_VGG16_TOPOLOGY.index(n)
                          for n in self.layer_names)
            trunk = _VGG16_TOPOLOGY[:deepest + 1]
            need = [n for n in trunk if not n.endswith('_pool')]
            absent = [n for n in need if n not in vgg]
            if absent:
                raise ValueError(
                    f'VGG16 weights file lacks layers {absent} '
                    f'needed for {self.layer_names}')
            self._vgg = [(n, vgg.get(n)) for n in trunk]
            return
        self._n_filters = tuple(n_filters)
        default = self._n_filters == (64, 128) and seed == 0
        if default and os.path.exists(self.WEIGHTS_V1):
            with np.load(self.WEIGHTS_V1) as f:
                self._kernels = [f[k] for k in sorted(f.files)]
        else:
            self._kernels = self.make_kernels(self._n_filters, seed)

    def _feature_maps(self, x):
        if self._vgg is not None:
            # caffe preprocess_input: BGR flip (no-op on replicated
            # grayscale) + per-channel mean subtraction
            x = x - jnp.asarray(_VGG16_MEANS, dtype=x.dtype)
            maps = {}
            for name, wb in self._vgg:
                if name.endswith('_pool'):
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                        (1, 2, 2, 1), 'VALID')
                    continue
                kernel, bias = wb
                x = jax.lax.conv_general_dilated(
                    x, jnp.asarray(kernel, x.dtype), (1, 1), 'SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                x = jax.nn.relu(x + jnp.asarray(bias, x.dtype))
                if name in self.layer_names:
                    maps[name] = x
            return [maps[n] for n in self.layer_names]
        maps = []
        for k in self._kernels:
            x = jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            x = jax.nn.relu(x)
            maps.append(x)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                'VALID')
        return maps

    def __call__(self, x1, x2):
        if x1.ndim == 5:
            n, s1, s2, t, f = x1.shape
            if self._vgg is not None:
                # numerical parity with the reference, which flattens
                # 5D batches with a RAW reshape (time interleaves into
                # spatial rows; reference: loss_metrics.py:701-710) —
                # required for ``weights=`` runs to reproduce its loss
                x1 = jnp.reshape(x1, (n * t, s1, s2, f))
                x2 = jnp.reshape(x2, (n * t, s1, s2, f))
            else:
                # the offline extractor batches time frames properly
                # (a deliberate improvement over the raw reshape)
                x1 = jnp.reshape(jnp.moveaxis(x1, 3, 1),
                                 (n * t, s1, s2, f))
                x2 = jnp.reshape(jnp.moveaxis(x2, 3, 1),
                                 (n * t, s1, s2, f))
        losses = []
        for i in range(x1.shape[-1]):
            a = jnp.repeat(x1[..., i:i + 1], 3, axis=-1)
            b = jnp.repeat(x2[..., i:i + 1], 3, axis=-1)
            fa = self._feature_maps(a)
            fb = self._feature_maps(b)
            losses.append(sum(jnp.mean((u - v) ** 2)
                              for u, v in zip(fa, fb)))
        return jnp.mean(jnp.stack(losses))


class _Named:
    """Wrap a plain fn so it looks like an instantiable loss class."""

    def __init__(self, fn):
        self._fn = fn

    def __call__(self, *args, **kwargs):
        return self._fn(*args, **kwargs)


LOSS_REGISTRY = {
    'MeanSquaredError': mse,
    'MeanAbsoluteError': mae,
    'mse': mse,
    'mae': mae,
    'ExpLoss': exp_loss,
    'MmdLoss': mmd_loss,
    'MmdMseLoss': mmd_mse_loss,
    'MaterialDerivativeLoss': material_derivative_loss,
    'SpatialDerivativeLoss': spatial_derivative_loss,
    'TemporalDerivativeLoss': temporal_derivative_loss,
    'CoarseMseLoss': coarse_mse_loss,
    'SpatialExtremesLoss': spatial_extremes_loss,
    'TemporalExtremesLoss': temporal_extremes_loss,
    'SpatialExtremesOnlyLoss': spatial_extremes_only_loss,
    'TemporalExtremesOnlyLoss': temporal_extremes_only_loss,
    'SpatialFftLoss': spatial_fft_loss,
    'SpatiotemporalFftLoss': spatiotemporal_fft_loss,
    'StExtremesFftLoss': None,  # composed below
    'LowResLoss': LowResLoss,
    'PerceptualLoss': PerceptualLoss,
    'SlicedWassersteinLoss': SlicedWassersteinLoss,
}


def st_extremes_fft_loss(x1, x2):
    """Spatiotemporal extremes + fft composite."""
    return (spatial_extremes_loss(x1, x2) + temporal_extremes_loss(x1, x2)
            + spatiotemporal_fft_loss(x1, x2))


LOSS_REGISTRY['StExtremesFftLoss'] = st_extremes_fft_loss


def get_loss_fun(loss):
    """Resolve a loss spec into a callable ``loss(x1, x2) -> scalar``.

    Accepts: a name string; a dict ``{Name: kwargs}`` for parameterized
    losses; a list of (name|dict, weight) pairs for weighted multi-term
    losses; or a callable passed through unchanged.

    Reference parity: sup3r/models/abstract.py:461-541.
    """
    if callable(loss) and not isinstance(loss, (str,)):
        return loss
    if isinstance(loss, str):
        if loss not in LOSS_REGISTRY:
            raise KeyError(
                f'Unknown loss "{loss}". Options: '
                f'{sorted(LOSS_REGISTRY)}')
        obj = LOSS_REGISTRY[loss]
        return obj() if isinstance(obj, type) else obj
    if isinstance(loss, dict):
        (name, kwargs), = loss.items()
        obj = LOSS_REGISTRY[name]
        if isinstance(obj, type):
            return obj(**kwargs)
        if kwargs:
            return functools.partial(obj, **kwargs)
        return obj
    if isinstance(loss, (list, tuple)):
        terms = []
        for item in loss:
            if isinstance(item, (list, tuple)) and len(item) == 2:
                spec, weight = item
            else:
                spec, weight = item, 1.0
            terms.append((get_loss_fun(spec), float(weight)))

        def multi(x1, x2, key=None):
            total = 0.0
            for i, (f, w) in enumerate(terms):
                sub = (None if key is None
                       else jax.random.fold_in(key, i))
                total = total + w * apply_loss(f, x1, x2, key=sub)
            return total

        multi.needs_key = any(
            getattr(f, 'needs_key', False) for f, _ in terms)
        return multi
    raise TypeError(f'Cannot resolve loss spec: {loss!r}')
