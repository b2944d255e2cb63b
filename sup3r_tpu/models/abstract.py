"""Model base classes: inference contract + shared training machinery.

``AbstractInterface`` is the inference-side contract every model obeys
(load/generate/meta/enhancement factors — reference:
sup3r/models/interface.py). ``AbstractSingleModel`` adds the train-side
machinery shared by GAN/conditional models: normalization stats, loss
resolution, exo feature routing, checkpoint I/O (reference:
sup3r/models/abstract.py).
"""

import json
import logging
import os
import platform
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

import sup3r_tpu
from sup3r_tpu.models.network import Network
from sup3r_tpu.names import strip_obs_suffix
from sup3r_tpu.ops.losses import get_loss_fun
from sup3r_tpu.utilities import safe_serialize

logger = logging.getLogger(__name__)

try:
    from flax import serialization as flax_serialization
except ImportError:  # pragma: no cover - flax is baked into this image
    flax_serialization = None


VERSION_RECORD = {
    'sup3r_tpu': sup3r_tpu.__version__,
    'jax': jax.__version__,
    'numpy': np.__version__,
    'python': sys.version,
    'platform': platform.platform(),
}


class AbstractInterface:
    """Inference contract: every model exposes ``generate``, ``load``,
    ``meta``, enhancement factors and feature lists."""

    meta: dict

    @classmethod
    def load(cls, model_dir, verbose=True):
        """Load a model from a save directory."""
        raise NotImplementedError

    def generate(self, low_res, norm_in=True, un_norm_out=True,
                 exogenous_data=None):
        """Generate high-res output from low-res input."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    @property
    def s_enhance(self):
        """Spatial enhancement factor (from meta, else layer mults)."""
        s = self.meta.get('s_enhance')
        if s is None and hasattr(self, '_gen'):
            s = self._gen.s_enhance
        return s

    @property
    def t_enhance(self):
        """Temporal enhancement factor (from meta, else layer mults)."""
        t = self.meta.get('t_enhance')
        if t is None and hasattr(self, '_gen'):
            t = self._gen.t_enhance
        return t

    @property
    def s_enhancements(self):
        """Per-step spatial enhancements (single-step: [s_enhance])."""
        return [self.s_enhance]

    @property
    def t_enhancements(self):
        """Per-step temporal enhancements (single-step: [t_enhance])."""
        return [self.t_enhance]

    @property
    def input_dims(self):
        """4 if the model takes spatial-only input, 5 for spatiotemporal."""
        if hasattr(self, '_gen'):
            return self._gen.input_dims
        if self.meta.get('input_resolution') is None:
            return 5
        return 4 if self.is_4d else 5

    @property
    def is_5d(self):
        """Whether the model expects 5D input."""
        return self.input_dims == 5

    @property
    def is_4d(self):
        """Whether the model expects 4D (spatial only) input."""
        return hasattr(self, '_gen') and not self._gen.is_5d

    @property
    def lr_features(self):
        """Low-res input feature names (training order)."""
        return self.meta.get('lr_features', [])

    @property
    def hr_out_features(self):
        """High-res output feature names."""
        return self.meta.get('hr_out_features', [])

    @property
    def obs_features(self):
        """Observation-fusion feature names (from Sup3rObs layers)."""
        if hasattr(self, '_gen'):
            return self._gen.obs_features
        return []

    @property
    def hr_exo_features(self):
        """High-res exogenous features, ordered like the network's exo
        layers (reference: sup3r/models/interface.py:392-418)."""
        features = []
        if hasattr(self, '_gen'):
            features = list(self._gen.exo_features)
        obs = [strip_obs_suffix(f) for f in self.obs_features]
        features += [f for f in obs if f not in self.hr_out_features]
        return features

    @property
    def hr_features(self):
        """All high-res channel names in training batches (out + exo)."""
        return list(self.hr_out_features) + list(self.hr_exo_features)

    @property
    def smoothing(self):
        """Gaussian smoothing sigma used on coarsened training input."""
        return self.meta.get('smoothing')

    @property
    def smoothed_features(self):
        """Features that were smoothed in training input."""
        return self.meta.get('smoothed_features', [])

    @property
    def model_params(self):
        """Serializable params for save directory."""
        return {'meta': self.meta}

    @property
    def version_record(self):
        """Versions this model was built with."""
        return VERSION_RECORD

    def set_model_params(self, **kwargs):
        """Merge training-session params into meta (validating enhancement
        factors against layer attributes — reference:
        sup3r/models/interface.py:453)."""
        keys = ('input_resolution', 'lr_features', 'hr_exo_features',
                'hr_out_features', 'smoothed_features', 'smoothing',
                's_enhance', 't_enhance')
        for key in keys:
            if key in kwargs and kwargs[key] is not None:
                self.meta[key] = kwargs[key]
        # record the concrete model class so multi-step loaders can
        # dispatch (reference: abstract.py model_params['meta']
        # ['class']); save_params re-stamps it at save time
        self.meta['class'] = type(self).__name__
        if hasattr(self, '_gen'):
            s_layers = self._gen.s_enhance
            t_layers = self._gen.t_enhance
            s = self.meta.get('s_enhance')
            t = self.meta.get('t_enhance')
            if s is not None and s_layers not in (1, s):
                raise RuntimeError(
                    f'Model layers suggest s_enhance={s_layers} but '
                    f'params say {s}')
            if t is not None and t_layers not in (1, t):
                raise RuntimeError(
                    f'Model layers suggest t_enhance={t_layers} but '
                    f'params say {t}')
        exo_feats = kwargs.get('hr_exo_features')
        if exo_feats and hasattr(self, '_gen'):
            net_feats = self.hr_exo_features
            if list(exo_feats) != list(net_feats):
                raise RuntimeError(
                    f'Batch handler exo features {exo_feats} do not match '
                    f'network exo layers {net_feats}')

    def save_params(self, out_dir):
        """Write model_params.json to the save directory (reference
        format: sup3r/models/interface.py:501)."""
        os.makedirs(out_dir, exist_ok=True)
        fp = os.path.join(out_dir, 'model_params.json')
        # the CURRENT class always wins at save time so multi-step
        # loaders dispatch correctly (reference records it in the meta
        # property, sup3r/models/base.py:355) — a setdefault would
        # keep a stale class from an imported meta
        meta = getattr(self, 'meta', None)
        if isinstance(meta, dict):
            meta['class'] = type(self).__name__
        params = self.model_params
        params['version_record'] = self.version_record
        with open(fp, 'w') as f:
            f.write(safe_serialize(params, indent=2, sort_keys=True))


class AbstractSingleModel(AbstractInterface):
    """Shared single-model machinery: norm stats, loss resolution,
    exo plumbing, parameter (de)serialization."""

    #: fuse pad/conv/crop blocks inside the jitted train step too —
    #: the same bit-identical rewrite as inference_fuse, applied to
    #: the generator's forward AND backward passes (the halo ring is
    #: wasted FLOPs in both directions). Gradients flow to the
    #: ORIGINAL param pytree: fusion preserves the leaf order (pad/
    #: crop/activation layers carry empty param dicts), so the fused
    #: structure is rebuilt in-graph with jax.tree.unflatten.
    train_fuse = True

    #: shard-aligned s1 conv formulation inside the train step: None
    #: (default) auto-enables it when a mesh with a spatial axis of
    #: width >= 4 is attached (``attach_mesh(..., spatial_axis=...)``
    #: / a 2D dp x sp mesh) — the reflect-pad formulation re-balances
    #: shard boundaries at every conv under s1 sharding (see
    #: ops/conv_ad.reflect_conv_shard_aligned; both its forward AND
    #: custom-VJP backward keep the global s1 size, so SPMD emits
    #: true 1-row halos in both passes: measured 173.6 -> 102.3 MB
    #: per step at sp8). At sp2 the reflect pad keeps s1 divisible,
    #: so the aligned path's boundary-correction collectives make it
    #: a net LOSS (scripts/scaling_study.py) — hence the width gate.
    #: True/False force it on/off.
    train_shard_aligned = None

    #: opt-in mixed-precision training: 'bfloat16' runs the generator
    #: and discriminator forward+backward in bf16 while master weights,
    #: gradients (cast back at the dtype boundary), optimizer state,
    #: and losses stay fp32 — the standard mixed-precision recipe.
    #: Default None (fp32 compute, matching the reference's fp32 TF
    #: training, sup3r/models/abstract.py:1190). Measured 1.29x at
    #: bench shapes — 92.5 vs 119.7 ms/step, 47.6 TFLOP/s
    #: (scripts/bench_train_bf16.py; docs/PERFORMANCE.md). Unlike
    #: inference (body convs already bf16-rounded internally via XLA's
    #: --xla_allow_excess_precision), training gains from halving the
    #: saved-activation and gradient bandwidth in the backward pass.
    #: Convergence parity vs fp32 is pinned by
    #: tests/training/test_bf16_train.py. Set BEFORE the first train
    #: step (the step closure caches it; assign train_dtype then
    #: ``_train_step_fn = None`` to rebuild).
    train_dtype = None

    def _auto_shard_aligned(self):
        """Resolve ``train_shard_aligned=None`` from the attached
        mesh: on when the spatial axis is >= 4 wide."""
        from sup3r_tpu.ops.conv_ad import shard_aligned_worthwhile

        axis = getattr(self, '_mesh_spatial_axis', None)
        mesh = getattr(self, '_mesh', None)
        if axis is None or mesh is None:
            return False
        return shard_aligned_worthwhile(mesh.shape[axis])

    def _train_gen_apply(self):
        """Generator apply for traced training paths, with fusable
        blocks rewritten (see ``train_fuse``). Falls back to the plain
        network when nothing fuses or the leaf-identity invariant
        doesn't hold."""
        if not self.train_fuse or self.gen_params is None:
            return self._gen.apply
        from sup3r_tpu.models.fuse import FusedReflectConv, fuse_network
        from sup3r_tpu.models.network import Network

        layers, ftmpl = fuse_network(self._gen.layers, self.gen_params)
        if not any(isinstance(lyr, FusedReflectConv) for lyr in layers):
            return self._gen.apply
        shard_aligned = self.train_shard_aligned
        if shard_aligned is None:
            shard_aligned = self._auto_shard_aligned()
        if shard_aligned:
            for lyr in layers:
                if isinstance(lyr, FusedReflectConv):
                    lyr.shard_aligned = True
        orig_leaves = jax.tree.leaves(self.gen_params)
        fused_leaves = jax.tree.leaves(ftmpl)
        same = (len(orig_leaves) == len(fused_leaves) and all(
            a is b for a, b in zip(orig_leaves, fused_leaves)))
        if not same:  # pragma: no cover - safety net
            logger.warning('Fused param leaf order diverged; training '
                           'falls back to the unfused generator')
            return self._gen.apply
        fused_def = jax.tree.structure(ftmpl)
        fnet = Network(layers)

        def apply(params, x, exo=None, train=False, dropout_key=None):
            fp = jax.tree.unflatten(fused_def, jax.tree.leaves(params))
            return fnet.apply(fp, x, exo=exo, train=train,
                              dropout_key=dropout_key)

        return apply

    #: opt-in gradient rematerialization: wrap the generator forward
    #: in jax.checkpoint so the backward pass recomputes activations
    #: instead of keeping all ~50 layers' intermediates in HBM —
    #: trades ~30% more generator FLOPs for several x larger feasible
    #: batch/chunk sizes on a 16 GB chip.
    train_remat = False

    def _maybe_remat(self, gen_apply):
        """Apply ``train_remat`` to a generator apply callable."""
        if not self.train_remat:
            return gen_apply
        rematted = jax.checkpoint(
            lambda p, x, exo: gen_apply(p, x, exo=exo))

        def apply(params, x, exo=None, **kwargs):
            if any(kwargs.values()):
                # silently dropping train=/dropout_key= would train
                # with dropout disabled — fail loudly instead
                raise NotImplementedError(
                    f'train_remat does not support {sorted(kwargs)} '
                    'kwargs on the generator apply')
            return rematted(params, x, exo or {})

        return apply

    def _train_cast(self):
        """Resolve ``train_dtype`` into a ``(tdt, cast)`` pair for the
        jitted loss fns. ``tdt`` is the compute dtype (None = fp32
        pass-through); ``cast(params, *arrays)`` returns the params
        pytree and each array cast to ``tdt``. Callers must cast the
        casted network's OUTPUTS back to fp32 so losses, gradients
        (the astype transpose restores fp32 at the boundary),
        and optimizer math stay fp32 — that is what keeps master
        weights full-precision."""
        tdt = jnp.dtype(self.train_dtype) if self.train_dtype else None

        def cast(params, *arrays):
            if tdt is None:
                return params, arrays
            return (jax.tree.map(lambda p: p.astype(tdt), params),
                    tuple(a.astype(tdt) for a in arrays))

        return tdt, cast

    def __init__(self):
        self.meta = {}
        self._means = None
        self._stdevs = None
        self._history = None
        self.loss_name = 'MeanSquaredError'
        self.loss_fun = get_loss_fun(self.loss_name)

    # ------------------------------------------------------------------
    # normalization
    def set_norm_stats(self, new_means, new_stdevs):
        """Set per-feature means/stds used to normalize IO."""
        if new_means is not None:
            self._means = {k: float(v) for k, v in new_means.items()}
        if new_stdevs is not None:
            self._stdevs = {k: float(v) for k, v in new_stdevs.items()}

    def _stats_for(self, features):
        means = np.array([self._means[f] for f in features],
                         dtype=np.float32)
        stds = np.array([self._stdevs[f] for f in features],
                        dtype=np.float32)
        stds = np.where(stds == 0, 1, stds)
        return means, stds

    def norm_input(self, low_res):
        """Normalize physical-units low-res input. jax.Array inputs
        stay jax (sharding/device placement preserved)."""
        if self._means is None:
            return low_res
        missing = [f for f in self.lr_features if f not in self._means]
        if missing:
            raise KeyError(
                f'Low-res features {missing} missing from norm stats')
        means, stds = self._stats_for(self.lr_features)
        import jax.numpy as jnp

        if isinstance(low_res, jnp.ndarray):
            return (low_res - jnp.asarray(means)) / jnp.asarray(stds)
        return (np.asarray(low_res) - means) / stds

    def un_norm_output(self, output):
        """Denormalize generated output back to physical units."""
        if self._means is None:
            return output
        missing = [f for f in self.hr_out_features if f not in self._means]
        if missing:
            raise KeyError(
                f'Output features {missing} missing from norm stats')
        means, stds = self._stats_for(self.hr_out_features)
        return np.asarray(output) * stds + means

    # ------------------------------------------------------------------
    # loss
    def set_loss_function(self, loss):
        """Resolve and set the content loss function."""
        self.loss_name = loss
        self.loss_fun = get_loss_fun(loss)

    @property
    def model_params(self):
        params = super().model_params
        params.update({
            'means': self._means,
            'stdevs': self._stdevs,
            'loss': self.loss_name
            if isinstance(self.loss_name, (str, list, dict))
            else str(self.loss_name),
        })
        return params

    @property
    def history(self):
        """Training history DataFrame (one row per epoch)."""
        return self._history

    # ------------------------------------------------------------------
    # exo routing (training batches carry exo channels last)
    def get_hr_exo_input(self, hi_res):
        """Extract the exo channels (last channels of a training HR batch)
        into the exo dict format the network expects (reference:
        sup3r/models/abstract.py:416)."""
        if not self.hr_exo_features:
            return {}
        out = {}
        hr_features = self.hr_features
        for f in self.hr_exo_features:
            idx = hr_features.index(f)
            out[f] = hi_res[..., idx:idx + 1]
        return out

    def _combine_loss_input(self, hi_res_true, hi_res_gen):
        """Append the true exo channels onto generated output so the
        discriminator sees the full channel set (reference:
        sup3r/models/abstract.py:438)."""
        if hi_res_true.shape[-1] > hi_res_gen.shape[-1]:
            exo = self.get_hr_exo_input(hi_res_true)
            extra = [exo[f] for f in self.hr_exo_features]
            hi_res_gen = jnp.concatenate([hi_res_gen, *extra], axis=-1)
        return hi_res_gen

    def _combine_fwp_input(self, low_res, exogenous_data=None):
        """Concat input-resolution exo channels onto low_res when the
        model expects more lr features than provided (reference:
        sup3r/models/interface.py:259)."""
        if exogenous_data is None:
            return low_res
        from sup3r_tpu.preprocessing.exo import ExoData

        if not isinstance(exogenous_data, ExoData):
            structured = all(
                isinstance(v, dict) and 'steps' in v
                for v in exogenous_data.values())
            if not structured:
                # simple {feature: array} dicts are layer-exo only
                return low_res
            exogenous_data = ExoData(exogenous_data)
        fnum_diff = len(self.lr_features) - low_res.shape[-1]
        if fnum_diff <= 0:
            return low_res
        exo_feats = self.lr_features[-fnum_diff:]
        missing = [f for f in exo_feats if f not in exogenous_data]
        assert not missing, (
            f'exogenous_data is missing input features {missing}')
        import jax.numpy as jnp

        xp = jnp if isinstance(low_res, jnp.ndarray) else np
        for feature in exo_feats:
            exo_input = exogenous_data.get_combine_type_data(
                feature, 'input')
            exo_input = xp.asarray(np.asarray(exo_input)
                                   if xp is np else exo_input)
            low_res = xp.concatenate(
                [low_res, xp.asarray(exo_input)], axis=-1)
        return low_res

    def _combine_fwp_output(self, hi_res, exogenous_data=None):
        """Concat output-resolution exo channels onto hi_res (reference:
        sup3r/models/interface.py:310)."""
        if exogenous_data is None:
            return hi_res
        from sup3r_tpu.preprocessing.exo import ExoData

        if not isinstance(exogenous_data, ExoData):
            structured = all(
                isinstance(v, dict) and 'steps' in v
                for v in exogenous_data.values())
            if not structured:
                return hi_res
            exogenous_data = ExoData(exogenous_data)
        fnum_diff = len(self.hr_out_features) - hi_res.shape[-1]
        if fnum_diff <= 0:
            return hi_res
        exo_feats = self.hr_out_features[-fnum_diff:]
        missing = [f for f in exo_feats if f not in exogenous_data]
        assert not missing, (
            f'exogenous_data is missing output features {missing}')
        for feature in exo_feats:
            exo_output = exogenous_data.get_combine_type_data(
                feature, 'output')
            hi_res = np.concatenate(
                [hi_res, np.asarray(exo_output)], axis=-1)
        return hi_res

    # ------------------------------------------------------------------
    # parameter (de)serialization
    @staticmethod
    def save_network_params(params, fp):
        """Serialize a params pytree to a msgpack file."""
        with open(fp, 'wb') as f:
            f.write(flax_serialization.to_bytes(
                jax.tree.map(np.asarray, params)))

    @staticmethod
    def load_network_params(template, fp):
        """Deserialize a params pytree using ``template`` for structure."""
        with open(fp, 'rb') as f:
            raw = f.read()
        try:
            return flax_serialization.from_bytes(template, raw)
        except (KeyError, ValueError) as e:
            if any(isinstance(p, dict) and 'kernel_out' in p
                   for p in jax.tree.leaves(
                       template, is_leaf=lambda x: isinstance(x, dict))):
                raise ValueError(
                    f'Could not restore {fp}: the checkpoint does not '
                    'match the current network structure. Note that '
                    'Sup3rObsModel layers with ``filters`` set now '
                    'train a two-stage projection (kernel/kernel_out); '
                    'checkpoints saved by the earlier single-kernel '
                    'form must be re-saved (or drop ``filters`` from '
                    'the layer config to restore the old shape). '
                    f'Original error: {e}') from e
            raise

    @classmethod
    def load_saved_params(cls, out_dir, verbose=True):
        """Read model_params.json from a save directory."""
        fp = os.path.join(out_dir, 'model_params.json')
        with open(fp) as f:
            params = json.load(f)
        if verbose:
            logger.info('Loading model from %s', out_dir)
        return params

    def save_history(self, out_dir):
        """Write history.csv if there is any history."""
        if isinstance(self._history, pd.DataFrame):
            self._history.to_csv(os.path.join(out_dir, 'history.csv'))

    @staticmethod
    def load_network(config, name):
        """Build a Network from a config list/dict/file path."""
        if isinstance(config, dict) and 'hidden_layers' in config:
            config = config['hidden_layers']
        net = Network(config)
        logger.debug('Built %s network with %d layers', name, len(net))
        return net

    @staticmethod
    def update_loss_details(record, new_details, prefix='',
                            max_batches=None):
        """Append a row of loss details; keep the last
        ``max_batches`` rows (the reference's ROLLING record carried
        across epochs, sup3r/models/abstract.py:590-623 — per-epoch
        resets would cold-start the disc gating every epoch)."""
        row = {f'{prefix}{k}': float(v) for k, v in new_details.items()}
        row_df = pd.DataFrame([row])
        if record is None or len(record) == 0:
            record = row_df
        else:
            record = pd.concat([record, row_df], ignore_index=True)
        if max_batches is not None and len(record) > max_batches:
            record = record.iloc[-max_batches:].reset_index(drop=True)
        return record

    @staticmethod
    def early_stop(history, column, threshold=0.005, n_epoch=5):
        """True when ``column`` improved less than ``threshold``
        (relative) for ``n_epoch`` consecutive epochs (reference:
        sup3r/models/abstract.py:643-698)."""
        if history is None or column not in history or len(
                history[column]) < n_epoch + 1:
            return False
        vals = np.asarray(history[column])[-(n_epoch + 1):]
        diffs = np.abs(np.diff(vals)) / np.abs(vals[:-1])
        stop = bool(np.all(diffs < threshold))
        if stop:
            logger.info(
                'Early stop: %s changed by less than %.4f for %d epochs',
                column, threshold, n_epoch)
        return stop
