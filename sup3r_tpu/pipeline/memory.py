"""HBM-aware planning for chunked inference: pick ``device_batch_size``
automatically from an activation-memory model of the (fused) generator,
and fall back to spatial mesh sharding when even ONE padded chunk
exceeds a chip's HBM.

This is the TPU-first ergonomic replacing the reference's static
hardware guidance ("compute nodes with ~100 cores and >170 GB RAM",
reference: examples/sup3rcc/README.rst:37) — the reference leaves chunk
sizing entirely to the user (strategy.py fwp_chunk_shape docs).

The analytic model walks the network's layer shapes: XLA's peak
residency for a feed-forward conv stack is dominated by the largest
adjacent (input, output) activation pair plus fusion temps; params and
the I/O buffers ride on top. The axon backend returns no
``cost_analysis``/``memory_analysis``, and a remote probe-compile costs
30-90 s per shape, so the estimate is closed-form with a safety factor
rather than compiler-reported.
"""

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

#: v5e per-chip HBM; override with SUP3R_TPU_HBM_GB or the
#: ``hbm_bytes`` argument (tests fake a tiny budget this way)
DEFAULT_HBM_BYTES = 16 * 1024 ** 3

#: fraction of HBM the planner allows the generator to use — leaves
#: headroom for XLA temps, the runtime, and double-buffered transfers
SAFETY = 0.6


def _layer_shapes(layers, in_shape):
    """Activation shape after every layer (batch-1 basis)."""
    shapes = [tuple(in_shape)]
    shape = tuple(in_shape)
    for lyr in layers:
        try:
            shape = tuple(lyr.out_shape(shape))
        except NotImplementedError:
            # fused layers don't do shape inference; a k3/s1 reflect
            # conv preserves spatial dims and we cannot see c_out
            # here, so reuse the current shape (channel counts in the
            # flagship bodies are constant between fusable blocks).
            # Any OTHER exception is a genuine planner bug and must
            # surface here, not as a device OOM after a 30-90 s
            # remote compile with a ~32x-undersized estimate.
            shape = tuple(shape)
        shapes.append(shape)
    return shapes


def estimate_activation_bytes(model, lr_shape):
    """Peak activation bytes to run ONE batch element of shape
    ``lr_shape`` (no batch dim) through the model, float32.

    Multi-step chains (``model.models``) take the max over their
    members' estimates at each member's (enhanced) input shape — the
    first batched dispatch runs every member, so the planner must
    budget for the hungriest step, not just the chain's endpoints."""
    members = getattr(model, 'models', None)
    if members:
        shape = tuple(lr_shape)
        peak = 0
        for member in members:
            peak = max(peak, estimate_activation_bytes(member, shape))
            se = int(getattr(member, 's_enhance', 1) or 1)
            te = int(getattr(member, 't_enhance', 1) or 1)
            if len(shape) == 4:
                shape = (shape[0] * se, shape[1] * se,
                         shape[2] * te, shape[3])
            else:
                shape = (shape[0] * se, shape[1] * se, shape[2])
        return peak
    gen = getattr(model, 'generator', None)
    if gen is None:  # physics/linear models: in + out only
        s = int(np.prod(lr_shape)) * 4
        se = int(getattr(model, 's_enhance', 1) or 1) ** 2
        te = int(getattr(model, 't_enhance', 1) or 1)
        return s * (1 + se * te)
    if getattr(model, 'is_4d', False) and len(lr_shape) == 4:
        # spatial models fold time into the batch at dispatch
        # (forward_pass._reshape_data_chunk): estimate one time slice
        # through the layers and scale by the folded batch factor
        t = int(lr_shape[2])
        shapes = _layer_shapes(gen.layers,
                               (1, lr_shape[0], lr_shape[1],
                                lr_shape[3]))
        shapes = [(s[0] * t, *s[1:]) for s in shapes]
    else:
        shapes = _layer_shapes(gen.layers, (1, *lr_shape))
    sizes = [int(np.prod(s)) * 4 for s in shapes]
    # peak = largest adjacent in+out pair (+50% fusion/temp headroom)
    peak_pair = max(a + b for a, b in zip(sizes[:-1], sizes[1:]))
    params = sum(
        int(np.prod(np.shape(leaf))) * 4
        for p in (model.gen_params or []) if p
        for leaf in (p.values() if isinstance(p, dict) else [p]))
    return int(1.5 * peak_pair + params + sizes[0] + sizes[-1])


def estimate_halo_bytes(model, lr_shape, n_devices):
    """Estimated ICI bytes exchanged per generator application when
    ONE chunk's s1 dim is sharded over ``n_devices`` (the
    use_mesh='spatial' path): every k3 conv needs a 1-cell boundary
    plane from each neighbor, both directions."""
    gen = getattr(model, 'generator', None)
    if gen is None or n_devices <= 1:
        return 0
    shapes = _layer_shapes(gen.layers, (1, *lr_shape))
    total = 0
    for lyr, shape in zip(gen.layers, shapes[:-1]):
        name = type(lyr).__name__
        if 'Conv' in name:  # incl. FusedReflectConv
            # plane = everything but the sharded s1 dim
            plane = int(np.prod(shape[2:])) * 4
            total += 2 * (n_devices - 1) * plane
    return total


def resolve_device_batch_size(model, padded_lr_shape, n_features,
                              hbm_bytes=None, max_batch=64):
    """('auto' resolution) -> (batch_size, use_spatial: bool).

    batch_size >= 1 chunks fit per dispatch; use_spatial=True means
    one padded chunk alone exceeds the HBM budget and the chunk
    should be sharded over the mesh instead."""
    if hbm_bytes is None:
        env = os.environ.get('SUP3R_TPU_HBM_GB')
        hbm_bytes = (float(env) * 1024 ** 3 if env
                     else DEFAULT_HBM_BYTES)
    budget = hbm_bytes * SAFETY
    lr_shape = (*padded_lr_shape, n_features)
    per_chunk = estimate_activation_bytes(model, lr_shape)
    if per_chunk > budget:
        logger.warning(
            'One padded chunk %s needs ~%.2f GB of ~%.2f GB usable '
            'HBM; falling back to use_mesh="spatial" sharding',
            lr_shape, per_chunk / 1024 ** 3, budget / 1024 ** 3)
        return 1, True
    batch = int(max(1, min(max_batch, budget // per_chunk)))
    logger.info(
        'device_batch_size=auto -> %d (per-chunk ~%.3f GB, budget '
        '~%.2f GB)', batch, per_chunk / 1024 ** 3,
        budget / 1024 ** 3)
    return batch, False
