"""Pure-functional network: an ordered list of DSL layers + a params
pytree, with the introspection hooks the pipeline layer relies on
(enhancement factors, exo/obs feature order, min input width).

Replaces phygnn's ``CustomNetwork`` (reference: sup3r/models/base.py:127,
sup3r/models/interface.py:100-123, :363-418).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from sup3r_tpu.models.layers import (
    EXO_LAYERS,
    OBS_LAYERS,
    FlexiblePadding,
    build_layers,
)


class Network:
    """A generator or discriminator: layers + functional init/apply."""

    def __init__(self, hidden_layers):
        """``hidden_layers``: a JSON list, a path to a JSON file with a
        ``hidden_layers`` key, or an already-built list of Layer objects.
        """
        if isinstance(hidden_layers, str):
            with open(hidden_layers) as f:
                config = json.load(f)
            hidden_layers = config['hidden_layers']
        if hidden_layers and isinstance(hidden_layers[0], dict):
            self.config = list(hidden_layers)
            self.layers = build_layers(hidden_layers)
        else:
            self.config = None
            self.layers = list(hidden_layers)

    # ------------------------------------------------------------------
    # introspection used by models / pipeline
    @property
    def s_enhance(self):
        """Product of layer spatial multipliers."""
        return int(np.prod([lyr.spatial_mult for lyr in self.layers]))

    @property
    def t_enhance(self):
        """Product of layer temporal multipliers."""
        return int(np.prod([lyr.temporal_mult for lyr in self.layers]))

    @property
    def is_5d(self):
        """Whether the network consumes 5D (spatiotemporal) input."""
        return any(
            type(lyr).__name__ in ('Conv3D', 'Conv3DTranspose', 'Cropping3D')
            or getattr(lyr, 'n_spatial', 2) == 3
            for lyr in self.layers
        ) or any(len(getattr(lyr, 'paddings', [])) == 5
                 for lyr in self.layers)

    @property
    def input_dims(self):
        """4 for spatial-only nets, 5 for spatiotemporal."""
        return 5 if self.is_5d else 4

    @property
    def exo_features(self):
        """Names of mid-network exogenous features, in layer order."""
        return [lyr.name for lyr in self.layers
                if isinstance(lyr, EXO_LAYERS)]

    @property
    def obs_features(self):
        """Names of observation-fusion features, in layer order."""
        return [lyr.name for lyr in self.layers
                if isinstance(lyr, OBS_LAYERS)]

    @property
    def min_input_width(self):
        """Minimum spatial/temporal input width imposed by the first
        padding layer (reflect padding requires input > pad width).
        Returns per-dim minimums excluding batch/channel, or None.

        Used by the forward-pass slicer boundary checks (reference:
        sup3r/pipeline/slicer.py:547-673 min_width semantics)."""
        for lyr in self.layers:
            if isinstance(lyr, FlexiblePadding):
                inner = lyr.paddings[1:-1]
                return tuple(max(a, b) + 1 for a, b in inner)
        return None

    # ------------------------------------------------------------------
    def init(self, key, in_shape):
        """Initialize parameters for the given input shape.

        Returns (params_list, out_shape). Shapes flow through the layer
        list so conv channel counts are resolved statically."""
        params = []
        shape = tuple(in_shape)
        for lyr in self.layers:
            key, sub = jax.random.split(key)
            p, shape = lyr.init(sub, shape)
            # exo-concat layers change channel count without params
            params.append(p)
        return params, shape

    def apply(self, params, x, exo=None, train=False, dropout_key=None,
              allow_pending_skips=False):
        """Run the network. ``exo`` maps feature name -> tensor for
        mid-network injection layers (exo and obs alike).
        ``allow_pending_skips`` permits running a layer-list PREFIX
        that cuts inside a residual span (profiling tooling only)."""
        ctx = {'exo': exo or {}, 'train': train,
               'dropout_key': dropout_key, 'skips': {}}
        for p, lyr in zip(params, self.layers):
            if dropout_key is not None:
                dropout_key, sub = jax.random.split(dropout_key)
                ctx['dropout_key'] = sub
            x = lyr.apply(p, x, ctx)
        if ctx['skips'] and not allow_pending_skips:
            raise ValueError(
                'Unclosed skip connections: '
                f'{sorted(ctx["skips"])} — each SkipConnection name must '
                'appear exactly twice')
        return x

    def out_shape(self, in_shape):
        """Static output shape for a given input shape (no params)."""
        shape = tuple(in_shape)
        for lyr in self.layers:
            shape = lyr.out_shape(shape)
        return shape

    def dtype_cast(self, params, dtype):
        """Cast all floating params to ``dtype`` (e.g. bf16 inference)."""
        return jax.tree.map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    def __len__(self):
        return len(self.layers)
