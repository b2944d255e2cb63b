"""Inference-time network optimization: rewrite
``FlexiblePadding(reflect) -> Conv(k3,s1) -> Cropping (-> LeakyReLU)``
sequences into single fused Pallas kernels.

Shape algebra (why this is exact): with inner reflect pad p and crop c,
the retained output pixels only ever read a 1-pixel reflect halo:
  * Conv(k3, valid):  centered window iff p = c + 1  (configs: p3/c2)
  * ConvT(k3, valid): centered window of the spatially-flipped kernel
    iff c = p + 1 (configs: p3/c4)
so both reduce to a k3/s1 reflect-boundary conv, which
``ops.pallas_kernels.reflect_conv`` computes in one VMEM-resident
kernel. Inline 'relu' activations fold in as LeakyReLU(alpha=0).
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from sup3r_tpu.models.layers import (
    Activation,
    Conv2D,
    Conv2DTranspose,
    Conv3D,
    Conv3DTranspose,
    Cropping2D,
    Cropping3D,
    FlexiblePadding,
    Layer,
    LeakyReLU,
)
from sup3r_tpu.ops.conv_ad import (
    reflect_conv_ad,
    reflect_conv_shard_aligned,
)
from sup3r_tpu.ops.pallas_kernels import (
    reflect_conv,
    reflect_conv_reference,
    small_reflect_conv,
)

logger = logging.getLogger(__name__)

#: conservative VMEM budget for the fused kernel's resident buffers
#: (padded input + accumulator + output + weights, plus compiler
#: headroom for pipelining)
_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


class FusedReflectConv(Layer):
    """Fused reflect-pad + k3 conv + crop + activation block.

    The shipped reference generators wrap every conv in
    FlexiblePadding(3, REFLECT) -> Conv(valid) -> Cropping(2)
    (reference: sup3r/configs/spatiotemporal/gen_3x_4x_2f.json), which
    computes a 2-cell halo ring that is immediately cropped away —
    ~45% of each conv's FLOPs on a (20, 20, 96) chunk. This block is
    the algebraic simplification (reflect-pad-1 + valid conv): bit
    identical output, measured 1.54x whole-generator speedup on v5e.

    ``use_pallas`` switches the small-block path to the hand-written
    Pallas kernel (see ops/pallas_kernels.py); off by default because
    XLA's conv emitter wins at production block sizes and the Pallas
    accumulation order differs from XLA's at the fp32 ulp level."""

    use_pallas = False

    #: shard-aligned s1 formulation for spatially-sharded inference
    #: (use_mesh='spatial'): zero-pad s1 in-conv + local boundary
    #: corrections instead of a global reflect-pad resize, so the
    #: SPMD partitioner inserts true 1-row halos instead of
    #: re-balancing shard boundaries at every conv (~10x wire
    #: reduction, scripts/scaling_study.py). Matches the default path
    #: to fp32 reassociation (~1e-6). Also bypasses the Pallas
    #: small-channel kernel (pallas_call does not partition).
    shard_aligned = False

    def __init__(self, n_spatial, alpha=None):
        self.n_spatial = n_spatial
        self.alpha = alpha

    def out_shape(self, in_shape):
        raise NotImplementedError(
            'FusedReflectConv is created by fuse_network with existing '
            'params; shape inference happens pre-fusion')

    def _fits_vmem(self, x, c_out):
        padded = np.prod([s + 2 for s in x.shape[1:-1]]) * x.shape[-1]
        out = np.prod(x.shape[1:-1]) * c_out
        weights = 3 ** self.n_spatial * x.shape[-1] * c_out
        total = 4 * (padded + 2 * out + weights)
        # large accumulators/padded blocks trigger register spills /
        # scratch exhaustion; keep the fused path to small blocks
        return (total < _VMEM_BUDGET_BYTES and out <= 256 * 1024
                and padded <= 300 * 1024)

    #: default-on: route tiny-channel 3D convs (ci*co <= 32, e.g. the
    #: flagship generator's final 8->2 conv at HR resolution) through
    #: the VPU shifted-FMA Pallas kernel — XLA's conv emitter pads the
    #: channel lane dim to 128 and runs ~2x slower AND in
    #: bf16-rounded-input precision (measured 5.9e-3 abs error vs
    #: float64 truth; the kernel is exact fp32 at 1.5e-6). The kernel
    #: carries a custom VJP (conv-formulated adjoints), so it runs in
    #: training too.
    small_channel_kernel = True

    def _small_ok(self, x, kernel):
        ci, co = kernel.shape[-2:]
        block = 4 * np.prod([s + 2 for s in x.shape[1:-1]])
        return (self.n_spatial == 3 and x.ndim == 5
                and x.dtype == jnp.float32
                and ci * co <= 32
                and block < 32 * 1024 * 1024)

    def apply(self, params, x, ctx):
        kernel = params['kernel'].astype(x.dtype)
        bias = params['bias'].astype(x.dtype)
        if self.shard_aligned:
            return reflect_conv_shard_aligned(
                x, kernel, bias, self.n_spatial, self.alpha)
        on_tpu = jax.default_backend() == 'tpu'
        if (self.small_channel_kernel and on_tpu
                and self._small_ok(x, kernel)):
            return small_reflect_conv(x, kernel, bias,
                                      alpha=self.alpha)
        # NOTE the symmetric "wide" case (tiny ci, many co — the
        # first 2->64 conv) stays on XLA's conv emitter: measured
        # round 3, every alternative loses (im2col 8.1-11.2 ms,
        # 27-tap einsums 9.4 ms, VMEM patch-matmul Pallas kernel
        # spills registers) vs the 5.0 ms conv. See
        # docs/PERFORMANCE.md round-3 profile.
        use_pallas = (self.use_pallas and on_tpu
                      and self._fits_vmem(x, kernel.shape[-1]))
        if use_pallas:
            return reflect_conv(x, kernel, bias, alpha=self.alpha)
        # custom-VJP block: identical forward ops; backward avoids
        # XLA's slow reflect-pad transpose chain (measured ~1 ms/layer
        # at train shapes — see ops/conv_ad.py)
        return reflect_conv_ad(x, kernel, bias, self.n_spatial,
                               self.alpha)


def _inner_pads(pad_layer):
    """Per-spatial-dim pad widths, or None if not all-equal reflect."""
    if pad_layer.mode != 'reflect':
        return None
    inner = pad_layer.paddings[1:-1]
    widths = {w for pair in inner for w in pair}
    if len(widths) != 1:
        return None
    return len(inner), widths.pop()


def fuse_network(layers, params):
    """Rewrite fusable sequences; returns (new_layers, new_params).

    Non-matching layers pass through untouched, so this is safe to run
    on any network."""
    new_layers, new_params = [], []
    i = 0
    n_fused = 0
    while i < len(layers):
        match = _match_sequence(layers, params, i)
        if match is None:
            new_layers.append(layers[i])
            new_params.append(params[i])
            i += 1
            continue
        emitted, consumed = match
        for lyr, p in emitted:
            new_layers.append(lyr)
            new_params.append(p)
        i += consumed
        n_fused += 1
    if n_fused:
        logger.info('Fused %d reflect-conv blocks for inference',
                    n_fused)
    return new_layers, new_params


def _match_sequence(layers, params, i):
    """Try to match a fusable sequence starting at layer i."""
    if not isinstance(layers[i], FlexiblePadding):
        return None
    pads = _inner_pads(layers[i])
    if pads is None:
        return None
    n_spatial, p = pads
    if i + 2 >= len(layers):
        return None
    conv = layers[i + 1]
    crop = layers[i + 2]
    conv_types = {2: (Conv2D, Conv2DTranspose),
                  3: (Conv3D, Conv3DTranspose)}[n_spatial]
    crop_type = {2: Cropping2D, 3: Cropping3D}[n_spatial]
    if not isinstance(conv, conv_types) or not isinstance(
            crop, crop_type):
        return None
    if conv.kernel_size != (3,) * n_spatial or conv.strides != (
            1,) * n_spatial or conv.padding != 'VALID':
        return None
    crops = {w for pair in crop.crops for w in pair}
    if len(crops) != 1:
        return None
    c = crops.pop()
    is_transpose = conv.transpose
    if is_transpose and c != p + 1:
        return None
    if not is_transpose and c != p - 1:
        return None

    # activation: inline on the conv, or a following LeakyReLU /
    # Activation('relu') layer
    alpha = None
    consumed = 3
    trailing = []
    if conv._act is not None:
        if getattr(conv, '_act') is not jax.nn.relu:
            return None
        alpha = 0.0
    elif i + 3 < len(layers):
        nxt = layers[i + 3]
        if isinstance(nxt, LeakyReLU):
            alpha = nxt.alpha
            consumed = 4
        elif isinstance(nxt, Activation) and nxt.name == 'relu':
            alpha = 0.0
            consumed = 4
        elif _movement_only_expansion(nxt) and i + 4 < len(layers):
            # conv -> EXPANSION -> activation: pixel shuffles /
            # frame repeats only MOVE or DUPLICATE values, so the
            # elementwise activation commutes exactly across them.
            # Folding it into the fused conv's epilogue removes a
            # standalone HBM-bound activation pass over the full
            # post-expansion tensor (~1.75 ms at the production HR
            # shape — docs/PERFORMANCE.md op-mix profile)
            act = layers[i + 4]
            if isinstance(act, LeakyReLU):
                alpha = act.alpha
            elif isinstance(act, Activation) and act.name == 'relu':
                alpha = 0.0
            if alpha is not None:
                consumed = 5
                trailing = [(nxt, params[i + 3])]

    # jax.lax.conv_transpose(stride 1, VALID) equals a full-padding
    # conv with the SAME (unflipped) kernel, so both conv and convT
    # fuse with the kernel as-is
    fused_params = {'kernel': params[i + 1]['kernel'],
                    'bias': params[i + 1]['bias']}
    emitted = [(FusedReflectConv(n_spatial, alpha=alpha),
                fused_params)] + trailing
    return emitted, consumed


def _movement_only_expansion(layer):
    """Whether ``layer`` only MOVES or DUPLICATES values (pixel
    shuffle / frame repeat) — the condition under which an elementwise
    activation commutes exactly across it. Linear temporal
    interpolation averages values and does NOT qualify."""
    from sup3r_tpu.models.layers import (
        SpatialExpansion,
        SpatioTemporalExpansion,
    )

    if isinstance(layer, SpatialExpansion):
        return True
    return (isinstance(layer, SpatioTemporalExpansion)
            and (layer.temporal_mult == 1
                 or layer.temporal_method in ('nearest',
                                              'depth_to_time')))


class SubpixelTailConv(Layer):
    """Opt-in speed mode: SpatioTemporalExpansion(spatial m) ->
    LeakyReLU -> FusedReflectConv(tail) folded to PRE-expansion
    resolution (ops/subpixel.py). ~1.45x over the d2s + Pallas-tail
    composition on v5e at production shapes, but the conv runs at the
    platform's bf16-rounded conv precision (max rel err ~3e-3 vs the
    exact-fp32 Pallas tail), so it is OFF by default — enable with
    ``Sup3rGan.inference_subpixel_tail = True``."""

    precision = 'default'

    def __init__(self, m, alpha_prev=None, alpha=None):
        self.m = m
        self.alpha_prev = alpha_prev
        self.alpha = alpha

    def out_shape(self, in_shape):
        raise NotImplementedError(
            'SubpixelTailConv is created by fuse_subpixel_tail with '
            'existing params')

    def apply(self, params, x, ctx):
        from sup3r_tpu.ops.subpixel import subpixel_tail_conv

        return subpixel_tail_conv(
            x, params['kernel'].astype(x.dtype),
            params['bias'].astype(x.dtype), self.m,
            alpha_prev=self.alpha_prev, alpha=self.alpha,
            precision=self.precision)


def fuse_subpixel_tail(layers, params):
    """Rewrite [SpatioTemporalExpansion(spatial only), LeakyReLU,
    FusedReflectConv] endings — or [SpatioTemporalExpansion,
    FusedReflectConv] when ``fuse_network`` already folded the
    activation into the PREVIOUS conv's epilogue — into one
    SubpixelTailConv. Safe no-op when the pattern is absent."""
    from sup3r_tpu.models.layers import SpatioTemporalExpansion

    new_layers = list(layers)
    new_params = list(params)
    for i in range(len(new_layers) - 1):
        exp = new_layers[i]
        if not (isinstance(exp, SpatioTemporalExpansion)
                and getattr(exp, 'spatial_mult', 1) > 1
                and getattr(exp, 'temporal_mult', 1) == 1):
            continue
        act = new_layers[i + 1]
        if isinstance(act, LeakyReLU) and i + 2 < len(new_layers):
            alpha_prev = act.alpha
            tail_idx = i + 2
        else:
            # activation already folded upstream by fuse_network
            alpha_prev = None
            tail_idx = i + 1
        tail = new_layers[tail_idx]
        if not (isinstance(tail, FusedReflectConv)
                and tail.n_spatial == 3):
            continue
        kernel = new_params[tail_idx].get('kernel')
        if kernel is None or kernel.shape[:3] != (3, 3, 3):
            continue
        fused = SubpixelTailConv(int(exp.spatial_mult),
                                 alpha_prev=alpha_prev,
                                 alpha=tail.alpha)
        new_layers[i:tail_idx + 1] = [fused]
        new_params[i:tail_idx + 1] = [new_params[tail_idx]]
        logger.info('Fused subpixel tail (m=%d) for inference',
                    fused.m)
        break
    return new_layers, new_params
