"""JSON layer-DSL interpreter: ``hidden_layers`` configs -> pure-functional
JAX layer graph.

The reference defines generators/discriminators as JSON lists interpreted
by phygnn's ``CustomNetwork`` into Keras layers (reference:
sup3r/configs/*/*.json; phygnn custom layers imported at
sup3r/models/utilities.py:10-27). Here each entry becomes a ``Layer``
object with two pure methods:

  * ``init(key, in_shape) -> (params, out_shape)``
  * ``apply(params, x, ctx) -> y``

``params`` are plain dict pytrees (empty for stateless layers), so a
network's parameters are a list pytree that jits/shards/serializes
directly. ``ctx`` is a trace-time python dict carrying skip-connection
caches and exogenous/observation tensors; its structure is static so
everything stays traceable under ``jit``.

Keras-semantics notes (for config parity):
  * data layout is feature-last: 4D ``(n, s1, s2, c)`` or 5D
    ``(n, s1, s2, t, c)``; convs use NHWC / NDHWC with HWIO kernels.
  * ``Conv*`` default padding 'valid'; ``Conv*Transpose`` with stride 1
    and 'valid' grows each spatial dim by ``k - 1``.
  * ``SpatialExpansion`` / ``SpatioTemporalExpansion`` are
    depth-to-space pixel shuffles (TF ordering) with optional temporal
    nearest/linear expansion; their ``spatial_mult``/``temporal_mult``
    attributes are how enhancement factors are inferred from a model
    (reference: sup3r/models/interface.py:100-123).
"""

import inspect
import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_INITIALIZER = jax.nn.initializers.glorot_uniform()

ACTIVATIONS = {
    'relu': jax.nn.relu,
    'sigmoid': jax.nn.sigmoid,
    'tanh': jnp.tanh,
    'elu': jax.nn.elu,
    'gelu': jax.nn.gelu,
    'softmax': jax.nn.softmax,
    'softplus': jax.nn.softplus,
    'linear': lambda x: x,
}


def _get_activation(name):
    if name is None:
        return None
    key = str(name).lower()
    if key not in ACTIVATIONS:
        raise KeyError(f'Unknown activation "{name}"')
    return ACTIVATIONS[key]


def _pair(v, n):
    """Normalize an int or sequence into an n-tuple."""
    if isinstance(v, (int, float)):
        return (int(v),) * n
    v = tuple(int(x) for x in v)
    if len(v) == 1:
        return v * n
    assert len(v) == n, f'Expected {n} values, got {v}'
    return v


class Layer:
    """Base layer: stateless identity."""

    #: class-level enhancement attributes read by enhancement inference
    spatial_mult = 1
    temporal_mult = 1

    def init(self, key, in_shape):
        """Return (params, out_shape) for the given input shape."""
        return {}, self.out_shape(in_shape)

    def out_shape(self, in_shape):
        """Output shape for the given input shape."""
        return in_shape

    def apply(self, params, x, ctx):
        """Apply the layer."""
        raise NotImplementedError

    def __repr__(self):
        return type(self).__name__


class Activation(Layer):
    """Elementwise activation by name."""

    def __init__(self, activation='relu', **_):
        self._fn = _get_activation(activation)
        self.name = activation

    def apply(self, params, x, ctx):
        return self._fn(x)


class LeakyReLU(Layer):
    """Leaky ReLU with configurable negative slope."""

    def __init__(self, alpha=0.3, **_):
        self.alpha = float(alpha)

    def apply(self, params, x, ctx):
        return jax.nn.leaky_relu(x, negative_slope=self.alpha)


class Dropout(Layer):
    """Inverted dropout; active only when ctx['train'] and a key is set."""

    def __init__(self, rate=0.5, **_):
        self.rate = float(rate)

    def apply(self, params, x, ctx):
        key = ctx.get('dropout_key')
        if not ctx.get('train') or key is None or self.rate <= 0:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0)


class Flatten(Layer):
    """Collapse all non-batch dims."""

    def out_shape(self, in_shape):
        return (in_shape[0], int(np.prod(in_shape[1:])))

    def apply(self, params, x, ctx):
        return jnp.reshape(x, (x.shape[0], -1))


class Dense(Layer):
    """Affine map on the last axis (Keras Dense semantics)."""

    def __init__(self, units, activation=None, **_):
        self.units = int(units)
        self._act = _get_activation(activation)

    def out_shape(self, in_shape):
        return (*in_shape[:-1], self.units)

    def init(self, key, in_shape):
        k = _INITIALIZER(key, (in_shape[-1], self.units), jnp.float32)
        return ({'kernel': k, 'bias': jnp.zeros((self.units,))},
                self.out_shape(in_shape))

    def apply(self, params, x, ctx):
        y = jnp.dot(x, params['kernel'].astype(x.dtype)) + params[
            'bias'].astype(x.dtype)
        return self._act(y) if self._act else y


class FlexiblePadding(Layer):
    """Pad with explicit per-dim widths and a numpy-style mode.

    Config gives TF-style ``paddings`` including batch/channel dims,
    e.g. ``[[0,0],[3,3],[3,3],[0,0]]`` (reference configs:
    sup3r/configs/spatial/gen_2x_2f.json).
    """

    def __init__(self, paddings, mode='REFLECT', **_):
        self.paddings = tuple(tuple(int(v) for v in p) for p in paddings)
        self.mode = {'REFLECT': 'reflect', 'CONSTANT': 'constant',
                     'SYMMETRIC': 'symmetric'}[str(mode).upper()]

    def out_shape(self, in_shape):
        return tuple(s + a + b for s, (a, b) in zip(in_shape, self.paddings))

    def apply(self, params, x, ctx):
        return jnp.pad(x, self.paddings, mode=self.mode)


class _Cropping(Layer):
    """Shared implementation for Cropping2D/3D (Keras semantics: int =
    same crop both sides of every spatial dim)."""

    n_spatial = 2

    def __init__(self, cropping=0, **_):
        if isinstance(cropping, int):
            crops = ((cropping, cropping),) * self.n_spatial
        else:
            crops = tuple(
                (c, c) if isinstance(c, int) else tuple(c) for c in cropping)
        self.crops = crops

    def out_shape(self, in_shape):
        spatial = [
            s - a - b
            for s, (a, b) in zip(in_shape[1:1 + self.n_spatial], self.crops)
        ]
        return (in_shape[0], *spatial, *in_shape[1 + self.n_spatial:])

    def apply(self, params, x, ctx):
        idx = [slice(None)]
        for (a, b) in self.crops:
            idx.append(slice(a, x.shape[len(idx)] - b))
        idx += [slice(None)] * (x.ndim - len(idx))
        return x[tuple(idx)]


class Cropping2D(_Cropping):
    """Crop spatial dims of a 4D tensor."""

    n_spatial = 2


class Cropping3D(_Cropping):
    """Crop the three inner dims of a 5D tensor."""

    n_spatial = 3


class _ConvBase(Layer):
    """Shared init/validation for conv layers."""

    n_spatial = 2
    transpose = False

    def __init__(self, filters, kernel_size, strides=1, padding='valid',
                 activation=None, **_):
        self.filters = int(filters)
        self.kernel_size = _pair(kernel_size, self.n_spatial)
        self.strides = _pair(strides, self.n_spatial)
        self.padding = str(padding).upper()
        self._act = _get_activation(activation)

    def _dim_numbers(self):
        if self.n_spatial == 2:
            return ('NHWC', 'HWIO', 'NHWC')
        return ('NDHWC', 'DHWIO', 'NDHWC')

    def out_shape(self, in_shape):
        spatial = []
        for s, k, st in zip(in_shape[1:1 + self.n_spatial],
                            self.kernel_size, self.strides):
            if self.transpose:
                if self.padding == 'VALID':
                    spatial.append((s - 1) * st + k)
                else:
                    spatial.append(s * st)
            elif self.padding == 'VALID':
                spatial.append((s - k) // st + 1)
            else:
                spatial.append(-(-s // st))
        return (in_shape[0], *spatial, self.filters)

    def init(self, key, in_shape):
        c_in = in_shape[-1]
        kshape = (*self.kernel_size, c_in, self.filters)
        kernel = _INITIALIZER(key, kshape, jnp.float32)
        params = {'kernel': kernel, 'bias': jnp.zeros((self.filters,))}
        return params, self.out_shape(in_shape)

    def apply(self, params, x, ctx):
        kernel = params['kernel'].astype(x.dtype)
        if self.transpose:
            y = jax.lax.conv_transpose(
                x, kernel, self.strides, self.padding,
                dimension_numbers=self._dim_numbers())
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, self.strides, self.padding,
                dimension_numbers=self._dim_numbers())
        y = y + params['bias'].astype(x.dtype)
        return self._act(y) if self._act else y


class Conv2D(_ConvBase):
    """2D convolution, NHWC."""

    n_spatial = 2


class Conv3D(_ConvBase):
    """3D convolution, NDHWC (dims = s1, s2, time)."""

    n_spatial = 3


class Conv2DTranspose(_ConvBase):
    """2D transposed convolution."""

    n_spatial = 2
    transpose = True


class Conv3DTranspose(_ConvBase):
    """3D transposed convolution."""

    n_spatial = 3
    transpose = True


def _depth_to_space_2d(x, r):
    """TF-ordered depth_to_space: (n, h, w, r*r*c) -> (n, h*r, w*r, c)."""
    n, h, w, d = x.shape
    c = d // (r * r)
    x = jnp.reshape(x, (n, h, w, r, r, c))
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return jnp.reshape(x, (n, h * r, w * r, c))


class SpatialExpansion(Layer):
    """Pixel-shuffle spatial expansion of a 4D tensor.

    ``spatial_mult`` m maps channels c -> c / m^2 while upscaling both
    spatial dims by m. The attribute is read for enhancement inference
    (reference: sup3r/models/interface.py:105-112).
    """

    def __init__(self, spatial_mult=1, **_):
        self.spatial_mult = int(spatial_mult)

    def out_shape(self, in_shape):
        n, h, w, c = in_shape
        m = self.spatial_mult
        if c % (m * m):
            raise ValueError(
                f'SpatialExpansion(spatial_mult={m}) needs channels '
                f'divisible by {m * m}, got {c}')
        return (n, h * m, w * m, c // (m * m))

    def apply(self, params, x, ctx):
        self.out_shape(x.shape)
        return _depth_to_space_2d(x, self.spatial_mult)


class SpatioTemporalExpansion(Layer):
    """Spatial pixel-shuffle and/or temporal expansion of a 5D tensor.

    temporal_method: 'nearest' repeats frames; 'linear' interpolates
    between frames onto the t*mult grid; 'depth_to_time' is a temporal
    pixel-shuffle moving channel blocks into new time steps (channels
    c -> c/mult), used by the Sup3rCC 24x configs (reference:
    sup3r/configs/sup3rcc/gen_trh_1x_24x_2f.json). ``t_roll`` rolls the
    expanded time axis (centers a daily profile).
    """

    def __init__(self, spatial_mult=1, temporal_mult=1,
                 temporal_method='nearest', t_roll=0, **_):
        self.spatial_mult = int(spatial_mult)
        self.temporal_mult = int(temporal_mult)
        self.temporal_method = temporal_method
        self.t_roll = int(t_roll)

    def out_shape(self, in_shape):
        n, s1, s2, t, c = in_shape
        m = self.spatial_mult
        if self.temporal_method == 'depth_to_time':
            if c % self.temporal_mult:
                raise ValueError(
                    f'depth_to_time with temporal_mult={self.temporal_mult} '
                    f'needs channels divisible by it, got {c}')
            c = c // self.temporal_mult
        if c % (m * m):
            raise ValueError(
                f'SpatioTemporalExpansion(spatial_mult={m}) needs channels '
                f'divisible by {m * m}, got {c}')
        return (n, s1 * m, s2 * m, t * self.temporal_mult, c // (m * m))

    def _expand_time(self, x):
        t_mult = self.temporal_mult
        if t_mult == 1:
            return x
        if self.temporal_method == 'nearest':
            out = jnp.repeat(x, t_mult, axis=3)
        elif self.temporal_method == 'depth_to_time':
            n, s1, s2, t, c = x.shape
            out = jnp.reshape(x, (n, s1, s2, t, t_mult, c // t_mult))
            out = jnp.reshape(out, (n, s1, s2, t * t_mult, c // t_mult))
        else:
            t = x.shape[3]
            pos = jnp.arange(t * t_mult) / t_mult
            lo = jnp.clip(jnp.floor(pos).astype(int), 0, t - 1)
            hi = jnp.clip(lo + 1, 0, t - 1)
            w = (pos - lo)[None, None, None, :, None]
            out = x[:, :, :, lo] * (1 - w) + x[:, :, :, hi] * w
        if self.t_roll:
            out = jnp.roll(out, self.t_roll, axis=3)
        return out

    def _expand_space(self, x):
        m = self.spatial_mult
        if m == 1:
            return x
        n, s1, s2, t, c = x.shape
        # fold time into batch, shuffle, unfold
        xt = jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(n * t, s1, s2, c)
        xt = _depth_to_space_2d(xt, m)
        xt = xt.reshape(n, t, s1 * m, s2 * m, c // (m * m))
        return jnp.transpose(xt, (0, 2, 3, 1, 4))

    def apply(self, params, x, ctx):
        self.out_shape(x.shape)
        return self._expand_space(self._expand_time(x))


class SkipConnection(Layer):
    """Named residual: first occurrence caches, second occurrence adds.

    Reference parity: phygnn SkipConnection used by all shipped
    generator configs.
    """

    def __init__(self, name, **_):
        self.name = name

    def out_shape(self, in_shape):
        return in_shape

    def apply(self, params, x, ctx):
        cache = ctx.setdefault('skips', {})
        if self.name in cache:
            start = cache.pop(self.name)
            if start.shape != x.shape:
                raise ValueError(
                    f'SkipConnection "{self.name}" shape mismatch: cached '
                    f'{start.shape} vs current {x.shape}')
            return x + start
        cache[self.name] = x
        return x


class _ExoLayerBase(Layer):
    """Base for mid-network exogenous data injection.

    ``ctx['exo']`` maps feature name -> tensor shaped like the current
    activation's spatial(/temporal) dims with trailing channel(s).
    """

    def __init__(self, name, **_):
        self.name = name

    def _get_exo(self, x, ctx):
        exo = ctx.get('exo') or {}
        if self.name not in exo:
            raise KeyError(
                f'Layer {type(self).__name__} requires exogenous feature '
                f'"{self.name}" but ctx only has {sorted(exo)}')
        t = exo[self.name]
        if t.ndim == x.ndim - 1:
            t = t[..., None]
        # broadcast batch dim if exo was provided unbatched
        if t.ndim == x.ndim and t.shape[0] == 1 and x.shape[0] != 1:
            t = jnp.broadcast_to(t, (x.shape[0], *t.shape[1:]))
        return t.astype(x.dtype)


class Sup3rAdder(_ExoLayerBase):
    """Add an exogenous raster to the current activation."""

    def apply(self, params, x, ctx):
        t = self._get_exo(x, ctx)
        return x + t


class Sup3rConcat(_ExoLayerBase):
    """Concatenate an exogenous raster as extra channel(s)."""

    def out_shape(self, in_shape):
        return (*in_shape[:-1], in_shape[-1] + 1)

    def apply(self, params, x, ctx):
        t = self._get_exo(x, ctx)
        return jnp.concatenate([x, t], axis=-1)


class Sup3rConcatObs(_ExoLayerBase):
    """Concatenate a (sparse, NaN-filled) observation raster plus its
    validity mask; NaNs become zeros so gradients stay finite."""

    def out_shape(self, in_shape):
        return (*in_shape[:-1], in_shape[-1] + 2)

    def apply(self, params, x, ctx):
        t = self._get_exo(x, ctx)
        mask = jnp.isfinite(t)
        filled = jnp.where(mask, t, 0.0)
        return jnp.concatenate([x, filled, mask.astype(x.dtype)], axis=-1)


class Sup3rObsModel(_ExoLayerBase):
    """Learned fusion of sparse observations: obs + mask pass through a
    1x1 projection whose output is added to the activation."""

    def __init__(self, name, filters=None, **_):
        super().__init__(name)
        self.filters = filters

    def init(self, key, in_shape):
        c = in_shape[-1]
        if self.filters is None:
            k = _INITIALIZER(key, (2, c), jnp.float32)
            return ({'kernel': k, 'bias': jnp.zeros((c,))}, in_shape)
        # ``filters`` is the HIDDEN width of a two-stage projection
        # (obs+mask -> filters -> activation channels). The old
        # single-kernel form made filters != channel count fail at
        # trace time (round-4 review finding)
        h = int(self.filters)
        k1, k2 = jax.random.split(key)
        return ({'kernel': _INITIALIZER(k1, (2, h), jnp.float32),
                 'bias': jnp.zeros((h,)),
                 'kernel_out': _INITIALIZER(k2, (h, c), jnp.float32),
                 'bias_out': jnp.zeros((c,))}, in_shape)

    def apply(self, params, x, ctx):
        t = self._get_exo(x, ctx)
        mask = jnp.isfinite(t)
        filled = jnp.where(mask, t, 0.0)
        obs_in = jnp.concatenate([filled, mask.astype(x.dtype)], axis=-1)
        proj = jnp.dot(obs_in, params['kernel'].astype(x.dtype)) + params[
            'bias'].astype(x.dtype)
        if 'kernel_out' in params:
            proj = jax.nn.leaky_relu(proj, 0.2)
            proj = jnp.dot(proj, params['kernel_out'].astype(
                x.dtype)) + params['bias_out'].astype(x.dtype)
        return x + proj


LAYER_REGISTRY = {
    'Activation': Activation,
    'LeakyReLU': LeakyReLU,
    'Dropout': Dropout,
    'Flatten': Flatten,
    'Dense': Dense,
    'FlexiblePadding': FlexiblePadding,
    'Cropping2D': Cropping2D,
    'Cropping3D': Cropping3D,
    'Conv2D': Conv2D,
    'Conv3D': Conv3D,
    'Conv2DTranspose': Conv2DTranspose,
    'Conv3DTranspose': Conv3DTranspose,
    'SpatialExpansion': SpatialExpansion,
    'SpatioTemporalExpansion': SpatioTemporalExpansion,
    'SkipConnection': SkipConnection,
    'Sup3rAdder': Sup3rAdder,
    'Sup3rConcat': Sup3rConcat,
    'Sup3rConcatObs': Sup3rConcatObs,
    'Sup3rObsModel': Sup3rObsModel,
}

#: layers that inject exogenous data mid-network
EXO_LAYERS = (Sup3rAdder, Sup3rConcat)
#: layers that inject observation data
OBS_LAYERS = (Sup3rConcatObs, Sup3rObsModel)


def build_layers(hidden_layers):
    """Expand a ``hidden_layers`` JSON list (including ``{"n": k,
    "repeat": [...]}`` blocks) into a flat list of Layer objects."""
    layers = []
    for entry in hidden_layers:
        if 'repeat' in entry:
            n = int(entry.get('n', 1))
            block = entry['repeat']
            for _ in range(n):
                layers.extend(build_layers(block))
            continue
        entry = dict(entry)
        cls_name = entry.pop('class')
        if cls_name not in LAYER_REGISTRY:
            raise KeyError(
                f'Unknown layer class "{cls_name}". Known: '
                f'{sorted(LAYER_REGISTRY)}')
        cls = LAYER_REGISTRY[cls_name]
        # constructors tolerate unknown keys (**_) for TF-config
        # compatibility, but a misspelled option ('aplha',
        # 'dilation_rate') silently building a DIFFERENT network is
        # worse than noise — warn on every unconsumed key
        named = {
            p for p, v in inspect.signature(
                cls.__init__).parameters.items()
            if v.kind in (v.POSITIONAL_OR_KEYWORD, v.KEYWORD_ONLY)
            and p != 'self'}
        unknown = set(entry) - named
        if unknown:
            logger.warning(
                'Layer %s ignores unsupported config key(s) %s '
                '(accepted: %s)', cls_name, sorted(unknown),
                sorted(named))
        layers.append(cls(**entry))
    return layers
