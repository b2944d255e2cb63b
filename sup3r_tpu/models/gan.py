"""Sup3rGan: super-resolution GAN with relativistic adversarial loss.

TPU-first training design: the whole (generator fwd + both losses +
both backward passes + both optimizer updates + gating) is ONE jitted
program. Data parallelism is expressed by sharding the batch over a
``jax.sharding.Mesh`` data axis and letting XLA insert the gradient
all-reduces over ICI — replacing the reference's host-thread-per-GPU
gradient summation (reference: sup3r/models/abstract.py:807-914).

Loss semantics match the reference (sup3r/models/base.py:507-549
relativistic average discriminator loss; :830-911 calc_loss; disc
gating by loss bounds :1145-1176; adaptive adversarial weight
:439-606).
"""

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from sup3r_tpu.models.abstract import AbstractSingleModel
from sup3r_tpu.models.network import Network
from sup3r_tpu.ops.losses import apply_loss, get_loss_fun

logger = logging.getLogger(__name__)


def _sigmoid_bce(logits, labels):
    """Numerically-stable sigmoid cross entropy (tf.nn semantics)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def relativistic_disc_loss(disc_out_true, disc_out_gen):
    """ESRGAN relativistic average discriminator loss [Wang2018].

    Swap the arguments to get the generator's adversarial loss.
    Reference parity: sup3r/models/base.py:507-549.
    """
    true_logits = disc_out_true - jnp.mean(disc_out_gen)
    fake_logits = disc_out_gen - jnp.mean(disc_out_true)
    logits = jnp.concatenate([true_logits, fake_logits], axis=0)
    labels = jnp.concatenate(
        [jnp.ones_like(disc_out_true), jnp.zeros_like(disc_out_gen)],
        axis=0)
    return jnp.mean(_sigmoid_bce(logits, labels))


def _make_optimizer(config):
    """optax optimizer from a config dict {'name', 'learning_rate', ...}."""
    config = dict(config or {})
    name = config.pop('name', 'Adam').lower()
    lr = float(config.pop('learning_rate', 1e-4))
    builders = {
        'adam': optax.adam,
        'adamw': optax.adamw,
        'sgd': optax.sgd,
        'rmsprop': optax.rmsprop,
    }
    if name not in builders:
        raise KeyError(f'Unknown optimizer "{name}"')
    # TF/Keras spellings in reference configs -> optax names, then
    # pass EVERY remaining key the optax builder accepts (momentum,
    # nesterov, weight_decay, decay, ...) — silently dropping them
    # trained with different hyperparameters than the config said
    import inspect

    tf_map = {'beta_1': 'b1', 'beta_2': 'b2', 'epsilon': 'eps',
              'rho': 'decay'}
    config = {tf_map.get(k, k): v for k, v in config.items()}
    accepted = set(inspect.signature(builders[name]).parameters)
    kwargs = {k: v for k, v in config.items() if k in accepted}
    dropped = {k: v for k, v in config.items()
               if k not in accepted and k != 'name'}
    if dropped:
        logger.warning(
            'Optimizer "%s" ignores config keys %s (no optax '
            'equivalent)', name, sorted(dropped))
    return builders[name](lr, **kwargs), {'name': name.capitalize(),
                                          'learning_rate': lr, **kwargs}


class Sup3rGan(AbstractSingleModel):
    """Super-resolving GAN (reference: sup3r/models/base.py:44)."""

    def __init__(self, gen_layers, disc_layers, optimizer=None,
                 learning_rate=1e-4, optimizer_disc=None,
                 learning_rate_disc=None, loss='MeanSquaredError',
                 meta=None, means=None, stdevs=None, name=None):
        """
        Parameters
        ----------
        gen_layers / disc_layers : list | str
            ``hidden_layers`` config list, or path to a JSON file with a
            ``hidden_layers`` key (reference configs load directly).
        optimizer / optimizer_disc : dict | None
            Optimizer configs like ``{'name': 'Adam', 'learning_rate':
            1e-4}``; ``learning_rate(_disc)`` shortcuts override.
        loss : str | dict | list
            Content loss spec resolved by
            :func:`sup3r_tpu.ops.losses.get_loss_fun`.
        """
        super().__init__()
        self.name = name or self.__class__.__name__
        self._gen = self.load_network(gen_layers, 'generator')
        self._disc = self.load_network(disc_layers, 'discriminator')
        self._gen_config = self._gen.config
        self._disc_config = self._disc.config

        if optimizer is None:
            optimizer = {'name': 'Adam', 'learning_rate': learning_rate}
        if optimizer_disc is None:
            optimizer_disc = dict(optimizer)
            if learning_rate_disc is not None:
                optimizer_disc['learning_rate'] = learning_rate_disc
        self._gen_tx, self._optimizer_config = _make_optimizer(optimizer)
        self._disc_tx, self._optimizer_disc_config = _make_optimizer(
            optimizer_disc)

        self.set_loss_function(loss)
        self.meta = meta if meta is not None else {}
        self.set_norm_stats(means, stdevs)

        self.gen_params = None
        self.disc_params = None
        self._gen_opt_state = None
        self._disc_opt_state = None
        self._gen_in_shape = None
        self._disc_in_shape = None
        self._train_step_fn = None
        self._gen_apply_fn = None
        self._val_step_fn = None
        self._train_record = None
        self.total_batches = 0
        self._init_key = jax.random.PRNGKey(42)

    # ------------------------------------------------------------------
    # weights
    def init_weights(self, lr_shape, hr_shape, seed=None):
        """Initialize generator/discriminator params for the given input
        shapes (idempotent unless shapes change channel counts)."""
        if seed is not None:
            self._init_key = jax.random.PRNGKey(seed)
        # an EXPLICIT seed always re-draws: the idempotence guard is
        # for repeated shape-setup calls, not for silently ignoring a
        # requested re-initialization
        if seed is not None or self.gen_params is None or (
                self._gen_in_shape and lr_shape[-1] != self._gen_in_shape[-1]
        ):
            k1, k2 = jax.random.split(self._init_key)
            self.gen_params, gen_out = self._gen.init(k1, lr_shape)
            self._gen_in_shape = tuple(lr_shape)
            disc_in = tuple(hr_shape)
            self.disc_params, _ = self._disc.init(k2, disc_in)
            self._disc_in_shape = disc_in
            self._gen_opt_state = self._gen_tx.init(self.gen_params)
            self._disc_opt_state = self._disc_tx.init(self.disc_params)
            logger.debug(
                'Initialized GAN weights: gen in %s -> out %s; disc in %s',
                lr_shape, gen_out, disc_in)

    @property
    def generator(self):
        """Generator Network object."""
        return self._gen

    @property
    def discriminator(self):
        """Discriminator Network object."""
        return self._disc

    @property
    def generator_weights(self):
        """Generator params pytree."""
        return self.gen_params

    @property
    def discriminator_weights(self):
        """Discriminator params pytree."""
        return self.disc_params

    @property
    def weights(self):
        """All trainable params."""
        return {'generator': self.gen_params,
                'discriminator': self.disc_params}

    # ------------------------------------------------------------------
    # losses (functional, traceable)
    def _split_exo(self, hr):
        """Split a training HR batch into exo dict + full tensor."""
        n_exo = len(self.hr_exo_features)
        if n_exo == 0:
            return {}, hr
        exo = {}
        for i, f in enumerate(self.hr_exo_features):
            idx = len(self.hr_out_features) + i
            exo[f] = hr[..., idx:idx + 1]
        return exo, hr

    def calc_loss(self, hi_res_true, hi_res_gen, weight_gen_advers=0.001,
                  train_gen=True, train_disc=False, compute_disc=False):
        """Compute GAN losses for a (true, generated) HR pair.

        Returns (loss, loss_details). Traceable under jit. Reference
        parity: sup3r/models/base.py:830-911.
        """
        hi_res_gen = self._combine_loss_input(hi_res_true, hi_res_gen)
        if hi_res_gen.shape != hi_res_true.shape:
            raise RuntimeError(
                f'Generated shape {hi_res_gen.shape} != true shape '
                f'{hi_res_true.shape}; check enhancement factors')
        d_true = self._disc.apply(self.disc_params, hi_res_true)
        d_gen = self._disc.apply(self.disc_params, hi_res_gen)
        details = {}
        loss = None
        if compute_disc or train_disc:
            details['loss_disc'] = relativistic_disc_loss(d_true, d_gen)
        if train_gen:
            n_exo = len(self.hr_exo_features)
            slc = slice(0, -n_exo) if n_exo else slice(None)
            content = self.loss_fun(hi_res_gen[..., slc],
                                    hi_res_true[..., slc])
            advers = relativistic_disc_loss(d_gen, d_true)
            loss = content + weight_gen_advers * advers
            details.update(loss_gen=loss, loss_gen_content=content,
                           loss_gen_advers=advers)
        elif train_disc:
            loss = details['loss_disc']
        return loss, details

    # ------------------------------------------------------------------
    # the single jitted train step
    def _split_exo_traced(self, hr):
        """Trace-time exo channel split for training batches."""
        n_exo = len(self.hr_exo_features)
        if n_exo == 0:
            return {}
        n_out = hr.shape[-1] - n_exo
        return {f: hr[..., n_out + i:n_out + i + 1]
                for i, f in enumerate(self.hr_exo_features)}

    def _make_gen_loss_fn(self):
        """Functional generator loss: (gen_params, disc_params, lr, hr,
        w_adv, key) -> (loss, aux). Subclasses override to change the
        content/adversarial structure (e.g. SolarCC daylight windows)."""
        disc = self._disc
        gen_apply = self._maybe_remat(self._train_gen_apply())
        loss_fun = self.loss_fun
        n_exo = len(self.hr_exo_features)
        exo_names = list(self.hr_exo_features)
        split_exo = self._split_exo_traced
        # dropout only activates when the networks actually carry
        # Dropout layers — otherwise keys stay unused and remat stays
        # compatible (the round-3 review found the PRNG keys were
        # threaded but never passed, silently disabling dropout)
        gen_do = any(type(l).__name__ == 'Dropout'
                     for l in self._gen.layers)
        disc_do = any(type(l).__name__ == 'Dropout'
                      for l in disc.layers)

        # mixed precision (train_dtype='bfloat16'): params/activations
        # cast at the network boundary, fp32 master weights + losses;
        # grads flow through astype (cast back to fp32 at the boundary)
        tdt, _cast_net = self._train_cast()

        def gen_loss_fn(gen_params, disc_params, lr, hr, w_adv, key):
            k_g, k_d1, k_d2, k_loss = jax.random.split(key, 4)
            exo = split_exo(hr)
            gkw = ({'train': True, 'dropout_key': k_g}
                   if gen_do else {})
            gp, (lr_c,) = _cast_net(gen_params, lr)
            exo_c = (exo if tdt is None
                     else {k: v.astype(tdt) for k, v in exo.items()})
            out = gen_apply(gp, lr_c, exo=exo_c, **gkw)
            out = out.astype(jnp.float32)
            full = (jnp.concatenate(
                [out] + [exo[f] for f in exo_names], axis=-1)
                if n_exo else out)
            d1kw = ({'train': True, 'dropout_key': k_d1}
                    if disc_do else {})
            d2kw = ({'train': True, 'dropout_key': k_d2}
                    if disc_do else {})
            dp, (hr_c, full_c) = _cast_net(disc_params, hr, full)
            d_true = disc.apply(dp, hr_c, **d1kw).astype(jnp.float32)
            d_gen = disc.apply(dp, full_c, **d2kw).astype(jnp.float32)
            slc = slice(0, -n_exo) if n_exo else slice(None)
            # per-call-randomized losses (SlicedWasserstein) redraw
            # from the step key, matching the reference's per-call
            # tf.random.normal (loss_metrics.py:724)
            content = apply_loss(loss_fun, out, hr[..., slc],
                                 key=k_loss)
            advers = relativistic_disc_loss(d_gen, d_true)
            loss = content + w_adv * advers
            aux = {'content': content, 'advers': advers,
                   'hi_res_gen': full}
            return loss, aux

        return gen_loss_fn

    def _make_disc_loss_fn(self):
        """Functional disc loss: (disc_params, hr, hi_res_gen, key) ->
        loss."""
        disc = self._disc
        disc_do = any(type(l).__name__ == 'Dropout'
                      for l in disc.layers)
        _, _cast_net = self._train_cast()

        def disc_loss_fn(disc_params, hr, hi_res_gen, key):
            dp, (hr, hi_res_gen) = _cast_net(disc_params, hr,
                                             hi_res_gen)
            if disc_do:
                k1, k2 = jax.random.split(key)
                d_true = disc.apply(dp, hr, train=True,
                                    dropout_key=k1)
                d_gen = disc.apply(dp, hi_res_gen,
                                   train=True, dropout_key=k2)
            else:
                d_true = disc.apply(dp, hr)
                d_gen = disc.apply(dp, hi_res_gen)
            return relativistic_disc_loss(
                d_true.astype(jnp.float32), d_gen.astype(jnp.float32))

        return disc_loss_fn

    def _build_train_step(self):
        """Build the jitted (gen+disc) train step.

        One XLA program: generator forward/backward, discriminator
        forward/backward, both optimizer updates, with boolean gating of
        each update via ``lax.cond`` so per-batch gating never triggers
        recompiles."""
        gen_tx, disc_tx = self._gen_tx, self._disc_tx
        gen_loss_fn = self._make_gen_loss_fn()
        disc_loss_fn = self._make_disc_loss_fn()

        def step(gen_params, disc_params, gen_opt, disc_opt, lr, hr,
                 w_adv, do_gen, do_disc, key):
            k_gen, k_disc = jax.random.split(key)
            (gen_loss, aux), gen_grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True)(
                    gen_params, disc_params, lr, hr, w_adv, k_gen)
            hi_res_gen = jax.lax.stop_gradient(aux['hi_res_gen'])
            disc_loss, disc_grads = jax.value_and_grad(disc_loss_fn)(
                disc_params, hr, hi_res_gen, k_disc)

            def upd_gen(_):
                updates, new_opt = gen_tx.update(gen_grads, gen_opt,
                                                 gen_params)
                return optax.apply_updates(gen_params, updates), new_opt

            def upd_disc(_):
                updates, new_opt = disc_tx.update(disc_grads, disc_opt,
                                                  disc_params)
                return optax.apply_updates(disc_params, updates), new_opt

            gen_params_new, gen_opt_new = jax.lax.cond(
                do_gen, upd_gen, lambda _: (gen_params, gen_opt), None)
            disc_params_new, disc_opt_new = jax.lax.cond(
                do_disc, upd_disc, lambda _: (disc_params, disc_opt), None)

            details = {
                'loss_gen': gen_loss,
                'loss_gen_content': aux['content'],
                'loss_gen_advers': aux['advers'],
                'loss_disc': disc_loss,
            }
            details.update({
                k: v for k, v in aux.items()
                if k not in ('content', 'advers', 'hi_res_gen')
                and getattr(v, 'ndim', 1) == 0})
            return (gen_params_new, disc_params_new, gen_opt_new,
                    disc_opt_new, details)

        self._raw_step = step
        return jax.jit(step, donate_argnums=(0, 1, 2, 3))

    @property
    def train_step_fn(self):
        """The compiled train step (built lazily)."""
        if self._train_step_fn is None:
            self._train_step_fn = self._build_train_step()
        return self._train_step_fn

    @property
    def _sample_transform(self):
        """Device-transform config consumed by the jitted sample step
        (trace-time constant)."""
        return getattr(self, '_sample_transform_cfg', None)

    @_sample_transform.setter
    def _sample_transform(self, cfg):
        if cfg != getattr(self, '_sample_transform_cfg', None):
            # the jitted sample step baked the OLD transform into its
            # trace; same-shaped samples would not retrace, silently
            # coarsening with stale config (round-4 review finding)
            self._sample_step_fn = None
        self._sample_transform_cfg = cfg

    def _split_sample_traced(self, sample):
        """Device-side HR->LR transform of a raw sample batch using the
        batch handler's transform config (traceable)."""
        from sup3r_tpu.ops import (
            spatial_coarsening,
            temporal_coarsening,
        )

        cfg = self._sample_transform
        lr = spatial_coarsening(sample, cfg['s_enhance'])
        if cfg['t_enhance'] > 1:
            lr = temporal_coarsening(lr, cfg['t_enhance'],
                                     cfg['method'])
        hr = sample[..., list(cfg['hr_features_ind'])]
        if cfg['squeeze_time']:
            lr = lr[:, :, :, 0, :]
            hr = hr[:, :, :, 0, :]
        return lr, hr

    @property
    def sample_train_step_fn(self):
        """Train step consuming a raw HR sample batch: the HR->LR
        coarsening transform runs ON DEVICE inside the same jitted
        program (one H2D transfer per batch, zero host transform
        cost). Requires ``self._sample_transform`` (set by train()
        from a device_transform batch handler)."""
        if getattr(self, '_sample_step_fn', None) is None:
            self._build_train_step()
            inner = self._raw_step

            def step(gen_params, disc_params, gen_opt, disc_opt,
                     sample, w_adv, do_gen, do_disc, key):
                lr, hr = self._split_sample_traced(sample)
                return inner(gen_params, disc_params, gen_opt,
                             disc_opt, lr, hr, w_adv, do_gen, do_disc,
                             key)

            self._sample_step_fn = jax.jit(step,
                                           donate_argnums=(0, 1, 2, 3))
        return self._sample_step_fn

    def run_gradient_descent_on_sample(self, sample,
                                       weight_gen_advers=0.001,
                                       train_gen=True,
                                       train_disc=False):
        """One gated optimization step from a raw HR sample batch."""
        sample = self._place_batch(sample)
        self._step_counter = getattr(self, '_step_counter', 0) + 1
        key = jax.random.PRNGKey(self._step_counter)
        (self.gen_params, self.disc_params, self._gen_opt_state,
         self._disc_opt_state, details) = self.sample_train_step_fn(
            self.gen_params, self.disc_params, self._gen_opt_state,
            self._disc_opt_state, sample,
            jnp.float32(weight_gen_advers), jnp.bool_(train_gen),
            jnp.bool_(train_disc), key)
        return self._fetch_details(details)

    def update_optimizer(self, option='generator', **kwargs):
        """Update optimizer config (e.g. learning_rate) mid-training;
        Adam moments are preserved (reference:
        sup3r/models/abstract.py update_optimizer)."""
        if option in ('generator', 'all'):
            cfg = {**self._optimizer_config, **kwargs}
            self._gen_tx, self._optimizer_config = _make_optimizer(cfg)
        if option in ('discriminator', 'all'):
            cfg = {**self._optimizer_disc_config, **kwargs}
            self._disc_tx, self._optimizer_disc_config = \
                _make_optimizer(cfg)
        # step closures capture the old tx; rebuild on next use
        self._train_step_fn = None
        self._sample_step_fn = None
        self._val_step_fn = None

    def attach_mesh(self, mesh, axis='data', spatial_axis=None):
        """Enable data-parallel training over a ``jax.sharding.Mesh``:
        batches are sharded over ``axis`` and params/optimizer state
        replicated; XLA inserts the gradient all-reduce over ICI
        (replacing the reference's host-thread-per-GPU gradient
        summation, reference: sup3r/models/abstract.py:807-914).

        On a 2D mesh from :func:`parallel.get_mesh_2d`, pass
        ``spatial_axis`` (or leave None to auto-detect a second mesh
        axis) to ALSO split each sample's first spatial dim across
        chips — dp x sp composition where XLA inserts the conv halo
        exchanges on the spatial axis."""
        from sup3r_tpu.parallel import replicate

        self._mesh = mesh
        self._mesh_axis = axis
        if spatial_axis is None and len(mesh.axis_names) == 2:
            # a 2D mesh implies dp x sp; pass spatial_axis=False to
            # replicate over the second axis instead
            spatial_axis = next(a for a in mesh.axis_names
                                if a != axis)
        self._mesh_spatial_axis = spatial_axis or None
        # step closures baked in the pre-mesh conv formulation (a
        # spatial axis switches the fused blocks to shard-aligned s1
        # convs — see train_shard_aligned); rebuild on next use
        self._train_step_fn = None
        self._sample_step_fn = None
        self._val_step_fn = None
        if self.gen_params is not None:
            self.gen_params = replicate(mesh, self.gen_params)
            self.disc_params = replicate(mesh, self.disc_params)
            self._gen_opt_state = replicate(mesh, self._gen_opt_state)
            self._disc_opt_state = replicate(mesh,
                                             self._disc_opt_state)

    def _place_batch(self, arr):
        """Shard a batch over the attached mesh (no-op without one).
        On a multi-host mesh ``arr`` is this process's LOCAL shard."""
        mesh = getattr(self, '_mesh', None)
        if mesh is None:
            return jnp.asarray(arr, dtype=jnp.float32)
        sp_axis = getattr(self, '_mesh_spatial_axis', None)
        if sp_axis is not None:
            from sup3r_tpu.parallel import shard_batch_spatial

            return shard_batch_spatial(
                mesh, np.asarray(arr, dtype=np.float32),
                batch_axis=self._mesh_axis, space_axis=sp_axis)
        from sup3r_tpu.parallel import shard_batch

        return shard_batch(mesh, np.asarray(arr, dtype=np.float32),
                           axis=self._mesh_axis)

    def run_gradient_descent(self, low_res, hi_res_true,
                             weight_gen_advers=0.001, train_gen=True,
                             train_disc=False):
        """One gated optimization step on a (lr, hr) batch pair.

        Both sub-networks' grads are computed in one fused program;
        ``train_gen``/``train_disc`` gate which updates apply."""
        lr = self._place_batch(low_res)
        hr = self._place_batch(hi_res_true)
        self._step_counter = getattr(self, '_step_counter', 0) + 1
        key = jax.random.PRNGKey(self._step_counter)
        (self.gen_params, self.disc_params, self._gen_opt_state,
         self._disc_opt_state, details) = self.train_step_fn(
            self.gen_params, self.disc_params, self._gen_opt_state,
            self._disc_opt_state, lr, hr,
            jnp.float32(weight_gen_advers), jnp.bool_(train_gen),
            jnp.bool_(train_disc), key)
        return self._fetch_details(details)

    @staticmethod
    def _fetch_details(details):
        """Loss scalars to host in ONE transfer: stacking the device
        scalars outside jit makes a single device array to fetch
        instead of one round trip per scalar (each fetch is a full
        tunnel/PCIe round trip in the train loop)."""
        keys = list(details)
        vals = np.asarray(jnp.stack([details[k] for k in keys]))
        return {k: float(v) for k, v in zip(keys, vals)}

    # ------------------------------------------------------------------
    # inference
    #: default-on: rewrite FlexiblePadding(3)/Conv/Cropping(2) blocks
    #: into reflect-pad-1 + valid-conv for generate() — the reference
    #: configs compute a halo ring that is immediately cropped, ~45%
    #: wasted conv FLOPs. Bit-identical output, measured 1.54x
    #: whole-generator speedup on v5e (see scripts/bench_kernels.py).
    inference_fuse = True
    #: opt-in: use the hand-written Pallas kernel for fused blocks
    #: small enough to be VMEM resident (fp32 accumulation order
    #: differs from XLA at the ulp level; XLA's conv emitter wins at
    #: production block sizes).
    inference_pallas = False
    #: opt-in: fold the final SpatialExpansion+LeakyReLU+tail-conv to
    #: pre-expansion resolution (ops/subpixel.py) — ~1.45x over the
    #: exact Pallas tail but at bf16-rounded conv precision (~3e-3
    #: rel), so off by default
    inference_subpixel_tail = False
    #: opt-in reduced-precision inference: set to 'bfloat16' to run the
    #: generator's convs on the MXU in bf16 (params/activations cast
    #: in-graph, output cast back to float32). ~2x HBM traffic
    #: reduction; output differs from fp32 at the bf16 epsilon (~3
    #: decimal digits) so it is off by default — the reference serves
    #: fp32 (TF float32 Keras inference).
    inference_dtype = None
    #: shard-aligned s1 conv formulation for spatially-sharded
    #: inference — set automatically by the forward-pass runner when
    #: use_mesh='spatial' (see ops/conv_ad.reflect_conv_shard_aligned:
    #: true 1-row SPMD halos instead of per-conv shard re-balancing,
    #: ~10x wire reduction; matches the default path to ~1e-6).
    inference_shard_aligned = False

    @property
    def inference_mode(self):
        """Named inference speed/accuracy profile.

        - ``'exact'`` (default): fp32 body + exact-fp32 Pallas tail —
          bit-identical to the unfused reference computation.
        - ``'fast'``: subpixel tail + bf16 body. Validated accuracy
          budget (tests/forward_pass/test_fast_mode.py): max abs
          error <= 0.05 on normalized-scale outputs through the full
          chunked forward-pass pipeline, and QA wavenumber/frequency
          spectra equal to the exact path within the reference parity
          tolerances (tests/conftest.py spectra bar). Measured 1.45x
          tail + ~1.07-1.26x body over exact on v5e
          (docs/PERFORMANCE.md "Subpixel tail").
        - ``'custom'`` (read-only): reported when the underlying
          flags (``inference_subpixel_tail`` / ``inference_dtype``)
          were set to some other combination by hand.
        """
        if (self.inference_subpixel_tail
                and self.inference_dtype == 'bfloat16'):
            return 'fast'
        if (not self.inference_subpixel_tail
                and self.inference_dtype is None):
            return 'exact'
        return 'custom'

    @inference_mode.setter
    def inference_mode(self, mode):
        if mode == 'exact':
            self.inference_subpixel_tail = False
            self.inference_dtype = None
        elif mode == 'fast':
            self.inference_subpixel_tail = True
            self.inference_dtype = 'bfloat16'
        else:
            raise ValueError(
                f'inference_mode must be "exact" or "fast", got '
                f'{mode!r}')

    def _get_gen_apply(self):
        if not isinstance(self._gen_apply_fn, dict):
            self._gen_apply_fn = {}
        dt = self.inference_dtype
        if dt not in self._gen_apply_fn:
            gen = self._gen
            if dt is None:
                def apply(params, x, exo):
                    return gen.apply(params, x, exo=exo)
            else:
                jdt = jnp.dtype(dt)

                def apply(params, x, exo):
                    params = jax.tree.map(
                        lambda p: p.astype(jdt), params)
                    x = x.astype(jdt)
                    exo = {k: v.astype(jdt) for k, v in exo.items()}
                    out = gen.apply(params, x, exo=exo)
                    return out.astype(jnp.float32)

            self._gen_apply_fn[dt] = jax.jit(apply)
        return self._gen_apply_fn[dt]

    def _get_fused_apply(self):
        """(jitted_fn, fused_params) with fused blocks; rebuilt when
        gen_params changes identity."""
        # cache key holds a STRONG reference to the params object and
        # compares identity — an id() key could collide after training
        # frees the old list and CPython reuses its address
        key = (self.gen_params, self.inference_pallas,
               self.inference_dtype, self.inference_subpixel_tail,
               self.inference_shard_aligned)
        # multi-slot: alternating modes on one instance (e.g. an exact
        # and a fast strategy sharing a process-cached model) must not
        # thrash a single slot — every rebuild re-jits and re-pays
        # executable loads for all compiled shapes
        entries = getattr(self, '_fused_cache_entries', None)
        if entries is None:
            entries = self._fused_cache_entries = []
        # drop entries built for a params object that is no longer the
        # live one (training replaces gen_params every step): each
        # entry pins a full fused copy of the generator params on
        # device, so keeping dead-params slots would hold ~4x params
        # HBM. Live-params entries (one per inference-flag combo,
        # e.g. exact + fast) stay.
        entries[:] = [e for e in entries if e[0][0] is key[0]]
        cached = next(
            (e for e in entries if e[0][1:] == key[1:]), None)
        if cached is None:
            from sup3r_tpu.models.fuse import (
                FusedReflectConv,
                fuse_network,
                fuse_subpixel_tail,
            )
            from sup3r_tpu.models.network import Network

            layers, fparams = fuse_network(self._gen.layers,
                                           self.gen_params)
            if self.inference_subpixel_tail:
                layers, fparams = fuse_subpixel_tail(layers, fparams)
            for lyr in layers:
                if isinstance(lyr, FusedReflectConv):
                    lyr.use_pallas = self.inference_pallas
                    lyr.shard_aligned = self.inference_shard_aligned
            fnet = Network(layers)
            dt = self.inference_dtype
            if dt is None:
                def apply(params, x, exo):
                    return fnet.apply(params, x, exo=exo)
            else:
                jdt = jnp.dtype(dt)

                def apply(params, x, exo):
                    params = jax.tree.map(
                        lambda p: p.astype(jdt), params)
                    x = x.astype(jdt)
                    exo = {k: v.astype(jdt) for k, v in exo.items()}
                    return fnet.apply(params, x,
                                      exo=exo).astype(jnp.float32)

            cached = (key, jax.jit(apply), fparams)
            entries.append(cached)
            if len(entries) > 4:  # params identity changed (training)
                entries.pop(0)
        return cached[1], cached[2]

    def _parse_exo_for_generate(self, exogenous_data, low_res_shape):
        """Accept either a simple {feature: array} dict or the structured
        ExoData format ({feature: {'steps': [{'combine_type', 'data'}]}})
        and return the {feature: array} dict of mid-network ('layer')
        rasters."""
        if not exogenous_data:
            return {}
        out = {}
        for feat, val in exogenous_data.items():
            if isinstance(val, dict) and 'steps' in val:
                for step in val['steps']:
                    if step.get('combine_type') == 'layer':
                        out[feat] = step['data']
            else:
                out[feat] = val
        return {k: jnp.asarray(np.asarray(v), dtype=jnp.float32)
                for k, v in out.items()}

    def _norm_layer_exo(self, exo):
        """Normalize mid-network exo rasters with their own feature
        stats (reference: sup3r/models/abstract.py:981 run_exo_layer
        -> _reshape_norm_exo — training concatenates NORMALIZED exo
        channels, so inference must feed the layers the same scale)."""
        if self._means is None:
            return exo
        out = {}
        for k, v in exo.items():
            key = k
            if key not in self._means and key.endswith('_obs'):
                # observation rasters share the base feature's scale
                key = key[:-4]
            if key in self._means:
                std = self._stdevs[key] or 1.0
                v = (v - self._means[key]) / std
            out[k] = v
        return out

    def _has_output_exo(self, exogenous_data):
        """Whether output-combine exo steps exist (those force a host
        fetch: the output concat is a host-side op)."""
        if not exogenous_data:
            return False
        for val in exogenous_data.values():
            if isinstance(val, dict):
                for step in val.get('steps', []):
                    if step.get('combine_type') == 'output':
                        return True
        return False

    def generate(self, low_res, norm_in=True, un_norm_out=True,
                 exogenous_data=None, fetch=True):
        """Public inference: (input-exo concat) -> normalize ->
        generator (+layer exo) -> denormalize -> (output-exo concat).

        low_res: 4D/5D physical-units array (n_obs first). Reference
        parity: sup3r/models/abstract.py:1037-1105. A jax.Array input
        (e.g. mesh-sharded by the chunk runner) is used as-is so its
        device placement/sharding survives into the jitted apply —
        with or without exogenous_data (layer-exo rasters ride into
        the jitted apply as replicated operands)."""
        if not isinstance(low_res, jnp.ndarray):
            low_res = np.asarray(low_res, dtype=np.float32)
        low_res = self._combine_fwp_input(low_res, exogenous_data)
        exo = self._parse_exo_for_generate(exogenous_data, low_res.shape)
        if norm_in and self._means is not None:
            low_res = self.norm_input(low_res)
            exo = self._norm_layer_exo(exo)
        if self.gen_params is None:
            hr_shape = self._dummy_hr_shape(low_res.shape)
            self.init_weights(low_res.shape, hr_shape)
        for f in self._gen.exo_features + self._gen.obs_features:
            if f not in exo:
                raise KeyError(
                    f'Model requires exogenous feature "{f}" passed via '
                    f'exogenous_data; got {sorted(exo)}')
        # exo arrays need a batch dim matching low_res
        fixed_exo = {}
        for k, v in exo.items():
            if v.ndim == low_res.ndim - 1:
                # a trailing singleton marks an unbatched raster WITH
                # its channel dim — even when its first spatial dim
                # happens to equal the batch size
                if v.shape[-1] == 1 or v.shape[0] != low_res.shape[0]:
                    v = v[None]
                else:
                    v = v[..., None]
            fixed_exo[k] = v
        if self.inference_fuse:
            apply_fn, fparams = self._get_fused_apply()
            out = apply_fn(fparams, jnp.asarray(low_res), fixed_exo)
        else:
            out = self._get_gen_apply()(
                self.gen_params, jnp.asarray(low_res), fixed_exo)
        un_done = False
        if un_norm_out and self._means is not None:
            means, stds = self._stats_for(self.hr_out_features)
            if out.shape[-1] == means.size:
                # denormalize ON DEVICE before the host fetch, as a
                # single jitted dispatch — host-side numpy on a
                # (batch, 60, 60, 96, f) block costs ~2 s/batch on a
                # 1-vCPU inference node, and two separate un-jitted
                # device ops cost a dispatch roundtrip each
                if not hasattr(self, '_unnorm_jit'):
                    self._unnorm_jit = jax.jit(
                        lambda o, s, m: o * s + m)
                out = self._unnorm_jit(out, jnp.asarray(stds),
                                       jnp.asarray(means))
                un_done = True
        if not fetch and un_done and not self._has_output_exo(
                exogenous_data):
            # pipelined inference: hand back the un-fetched device
            # array so the caller can overlap the host fetch/write of
            # this batch with the dispatch of the next one (layer/
            # input exo is fine — only output-combine forces a fetch)
            return out
        out = np.asarray(out)
        if not out.flags.writeable:
            # zero-copy views of device buffers are read-only; the
            # writers mutate in place (limits, u/v inversion)
            out = out.copy()
        if un_norm_out and not un_done and self._means is not None:
            out = self.un_norm_output(out)
        out = self._combine_fwp_output(out, exogenous_data)
        return out

    def _dummy_hr_shape(self, lr_shape):
        s, t = self._gen.s_enhance, self._gen.t_enhance
        n_out = self._gen.out_shape(lr_shape)[-1]
        n_hr = n_out + len(self.hr_exo_features)
        if len(lr_shape) == 5:
            return (lr_shape[0], lr_shape[1] * s, lr_shape[2] * s,
                    lr_shape[3] * t, n_hr)
        return (lr_shape[0], lr_shape[1] * s, lr_shape[2] * s, n_hr)

    # ------------------------------------------------------------------
    # save / load
    @property
    def model_params(self):
        params = super().model_params
        params.update({
            'gen_config': self._gen_config,
            'disc_config': self._disc_config,
            'gen_in_shape': self._gen_in_shape,
            'disc_in_shape': self._disc_in_shape,
            'optimizer': self._optimizer_config,
            'optimizer_disc': self._optimizer_disc_config,
        })
        return params

    def save(self, out_dir):
        """Save params + meta to a directory (model_gen.msgpack,
        model_disc.msgpack, model_params.json, history.csv — same
        directory layout idea as the reference's pkl format, reference:
        sup3r/models/base.py:133-214)."""
        os.makedirs(out_dir, exist_ok=True)
        if self.gen_params is not None:
            self.save_network_params(
                self.gen_params, os.path.join(out_dir, 'model_gen.msgpack'))
            self.save_network_params(
                self.disc_params,
                os.path.join(out_dir, 'model_disc.msgpack'))
            self.save_network_params(
                (self._gen_opt_state, self._disc_opt_state),
                os.path.join(out_dir, 'opt_state.msgpack'))
        self.save_params(out_dir)
        self.save_history(out_dir)
        logger.info('Saved GAN to %s', out_dir)

    @classmethod
    def _extra_load_kwargs(cls, params):
        """Subclass hook: extra constructor kwargs pulled from the
        saved model_params (e.g. WithObs observation settings)."""
        return {}

    @classmethod
    def load(cls, model_dir, verbose=True):
        """Load a saved GAN (reference: sup3r/models/base.py:184-214)."""
        params = cls.load_saved_params(model_dir, verbose=verbose)
        model = cls(
            params['gen_config'], params['disc_config'],
            optimizer=params.get('optimizer'),
            optimizer_disc=params.get('optimizer_disc'),
            loss=params.get('loss', 'MeanSquaredError'),
            meta=params.get('meta', {}),
            means=params.get('means'), stdevs=params.get('stdevs'),
            **cls._extra_load_kwargs(params))
        gen_in = params.get('gen_in_shape')
        disc_in = params.get('disc_in_shape')
        if gen_in is not None:
            model.init_weights(tuple(gen_in), tuple(disc_in))
            model.gen_params = cls.load_network_params(
                model.gen_params,
                os.path.join(model_dir, 'model_gen.msgpack'))
            model.disc_params = cls.load_network_params(
                model.disc_params,
                os.path.join(model_dir, 'model_disc.msgpack'))
            fp_opt = os.path.join(model_dir, 'opt_state.msgpack')
            if os.path.exists(fp_opt):
                self_state = (model._gen_opt_state, model._disc_opt_state)
                (model._gen_opt_state,
                 model._disc_opt_state) = cls.load_network_params(
                    self_state, fp_opt)
        fp_history = os.path.join(model_dir, 'history.csv')
        if os.path.exists(fp_history):
            model._history = pd.read_csv(fp_history, index_col=0)
        return model

    # ------------------------------------------------------------------
    # training loop
    @staticmethod
    def get_weight_update_fraction(history, comparison_key,
                                   update_bounds=(0.5, 0.95),
                                   update_frac=0.0):
        """Multiplier for the adversarial weight based on how often the
        disc trained last epoch (reference: sup3r/models/base.py:439)."""
        val = history[comparison_key]
        if isinstance(val, (list, tuple, np.ndarray, pd.Series)):
            val = np.asarray(val).ravel()[-1]
        if val < update_bounds[0]:
            return 1 + update_frac
        if val > update_bounds[1]:
            return 1 / (1 + update_frac)
        return 1

    def update_adversarial_weights(self, history, adaptive_update_fraction,
                                   adaptive_update_bounds,
                                   weight_gen_advers, train_disc):
        """Adapt the adversarial weight from disc training frequency."""
        if adaptive_update_fraction > 0 and train_disc:
            frac = self.get_weight_update_fraction(
                history, 'train_disc_train_frac',
                update_frac=adaptive_update_fraction,
                update_bounds=adaptive_update_bounds)
            weight_gen_advers *= frac
            if frac != 1:
                logger.debug('New adversarial weight: %.4e',
                             weight_gen_advers)
        return weight_gen_advers

    @staticmethod
    def check_batch_handler_attrs(batch_handler):
        """Pull optional metadata attrs off a batch handler."""
        return {
            k: getattr(batch_handler, k, None)
            for k in ['smoothing', 'lr_features', 'hr_exo_features',
                      'hr_out_features', 'smoothed_features']
            if hasattr(batch_handler, k)
        }

    def _train_batch(self, batch, train_gen, only_gen, gen_too_good,
                     train_disc, only_disc, disc_too_good,
                     weight_gen_advers):
        """Gated updates for one batch (reference:
        sup3r/models/base.py:944-1032)."""
        do_gen = bool(only_gen or (train_gen and not gen_too_good))
        do_disc = bool(only_disc or (train_disc and not disc_too_good))
        if hasattr(batch, 'sample'):
            details = self.run_gradient_descent_on_sample(
                batch.sample, weight_gen_advers=weight_gen_advers,
                train_gen=do_gen, train_disc=do_disc)
        else:
            details = self.run_gradient_descent(
                batch.low_res, batch.high_res,
                weight_gen_advers=weight_gen_advers,
                train_gen=do_gen, train_disc=do_disc)
        details['gen_train_frac'] = float(do_gen)
        details['disc_train_frac'] = float(do_disc)
        return details

    def _train_epoch(self, batch_handler, weight_gen_advers, train_gen,
                     train_disc, disc_loss_bounds):
        """One epoch with loss-bound disc/gen gating (reference:
        sup3r/models/base.py:1097-1191)."""
        disc_th_low = np.min(disc_loss_bounds)
        disc_th_high = np.max(disc_loss_bounds)
        only_gen = train_gen and not train_disc
        only_disc = train_disc and not train_gen

        loss_disc_mean = 0.0
        if (self._train_record is not None
                and 'train_loss_disc' in self._train_record):
            loss_disc_mean = float(
                self._train_record['train_loss_disc'].mean())

        n_batches = len(batch_handler)
        for ib, batch in enumerate(batch_handler):
            t0 = time.time()
            disc_too_good = loss_disc_mean <= disc_th_low
            disc_too_bad = (loss_disc_mean > disc_th_high) and train_disc
            gen_too_good = disc_too_bad

            details = self._train_batch(
                batch, train_gen, only_gen, gen_too_good, train_disc,
                only_disc, disc_too_good, weight_gen_advers)
            self._train_record = self.update_loss_details(
                self._train_record, details, prefix='train_',
                max_batches=n_batches)
            loss_disc_mean = float(
                self._train_record['train_loss_disc'].mean())
            logger.debug(
                'Batch %d/%d gen %.3e disc %.3e (%.3fs)', ib + 1,
                n_batches, details['loss_gen'], details['loss_disc'],
                time.time() - t0)
        self.total_batches += n_batches
        out = self._train_record.mean().to_dict()
        out['total_batches'] = int(self.total_batches)
        return out

    def _augment_val_exo(self, hr, exo, key):
        """Hook for subclasses that need extra exo entries at
        validation. SolarCC's val step routes through it;
        Sup3rGanWithObs instead overrides ``_get_val_step_fn``
        wholesale (its obs injection is coupled to the obs loss
        terms), so a new obs-style subclass should follow
        with_obs.py, not this hook."""
        return exo

    def _get_val_step_fn(self):
        """ONE jitted program per val batch (generate + both disc
        passes + losses) with the scalars fetched in a single
        transfer — the un-jitted per-op path paid the ~3 ms dispatch
        floor dozens of times per batch plus one tunnel round trip
        per scalar (round-4 review finding)."""
        if getattr(self, '_val_step_fn', None) is None:
            gen_apply = self._get_gen_apply()
            disc = self._disc
            n_exo = len(self.hr_exo_features)
            slc = slice(0, -n_exo) if n_exo else slice(None)

            def val_step(gen_params, disc_params, lr, hr, w_adv, key):
                exo = self._split_exo_traced(hr)
                exo = self._augment_val_exo(hr, exo, key)
                out = gen_apply(gen_params, lr, exo)
                full = self._combine_loss_input(hr, out)
                d_true = disc.apply(disc_params, hr)
                d_gen = disc.apply(disc_params, full)
                content = self.loss_fun(full[..., slc], hr[..., slc])
                advers = relativistic_disc_loss(d_gen, d_true)
                return {
                    'loss_disc': relativistic_disc_loss(d_true, d_gen),
                    'loss_gen': content + w_adv * advers,
                    'loss_gen_content': content,
                    'loss_gen_advers': advers,
                }

            self._val_step_fn = jax.jit(val_step)
        return self._val_step_fn

    def calc_val_loss(self, batch_handler, weight_gen_advers):
        """Mean validation losses over the val queue (reference:
        sup3r/models/base.py:913-943)."""
        val_data = getattr(batch_handler, 'val_data', None)
        if val_data is None or (hasattr(val_data, '__len__')
                                and len(val_data) == 0):
            return {}
        record = None
        key = jax.random.PRNGKey(0)
        step = self._get_val_step_fn()
        w_adv = jnp.float32(weight_gen_advers)
        for batch in val_data:
            if hasattr(batch, 'sample'):
                lr, hr = self._split_sample_traced(
                    jnp.asarray(batch.sample, dtype=jnp.float32))
            else:
                lr = jnp.asarray(batch.low_res, dtype=jnp.float32)
                hr = jnp.asarray(batch.high_res, dtype=jnp.float32)
            key, sub = jax.random.split(key)
            details = step(self.gen_params, self.disc_params, lr, hr,
                           w_adv, sub)
            record = self.update_loss_details(
                record, self._fetch_details(details), prefix='val_')
        return record.mean().to_dict() if record is not None else {}

    def train(self, batch_handler, input_resolution, n_epoch,
              weight_gen_advers=0.001, train_gen=True, train_disc=True,
              disc_loss_bounds=(0.45, 0.6), checkpoint_int=None,
              out_dir='./gan_{epoch}', early_stop_on=None,
              early_stop_threshold=0.005, early_stop_n_epoch=5,
              adaptive_update_bounds=(0.9, 0.99),
              adaptive_update_fraction=0.0, multi_gpu=False,
              tensorboard_log=False, tensorboard_profile=False):
        """Train the GAN (reference: sup3r/models/base.py:624-828).

        ``multi_gpu`` is accepted for API parity (data parallelism
        here is mesh sharding of the batch, see module docstring).
        ``tensorboard_log=True`` writes per-epoch loss scalars to
        ``<out_dir>/../logs`` (torch's TF-free event writer);
        ``tensorboard_profile=True`` captures a jax.profiler trace of
        the first epoch viewable in TensorBoard.
        """
        self.set_norm_stats(batch_handler.means, batch_handler.stds)
        params = self.check_batch_handler_attrs(batch_handler)
        self.set_model_params(
            input_resolution=input_resolution,
            s_enhance=batch_handler.s_enhance,
            t_enhance=batch_handler.t_enhance, **params)
        transform_config = getattr(batch_handler, 'transform_config',
                                   None)
        if transform_config is not None:
            # the property setter invalidates the cached jitted sample
            # step when the config changes
            self._sample_transform = transform_config

        lr_shape = (1, *batch_handler.lr_shape)
        hr_shape = (1, *batch_handler.hr_shape)
        self.init_weights(lr_shape, hr_shape)

        epochs = list(range(n_epoch))
        if self._history is None:
            self._history = pd.DataFrame(columns=['elapsed_time'])
        else:
            epochs = [e + len(self._history) for e in epochs]

        tb_writer = None
        if tensorboard_log:
            from sup3r_tpu.models.utilities import make_tb_writer

            tb_writer = make_tb_writer(out_dir)

        t0 = time.time()
        stop = False
        for epoch in epochs:
            if tensorboard_profile and epoch == epochs[0]:
                from sup3r_tpu.models.utilities import profile_to_dir

                log_dir = os.path.join(
                    os.path.dirname(out_dir or './'), 'profile')
                with profile_to_dir(log_dir):
                    loss_details = self._train_epoch(
                        batch_handler, weight_gen_advers, train_gen,
                        train_disc, disc_loss_bounds)
            else:
                loss_details = self._train_epoch(
                    batch_handler, weight_gen_advers, train_gen,
                    train_disc, disc_loss_bounds)
            val_details = self.calc_val_loss(batch_handler,
                                             weight_gen_advers)
            loss_details.update(val_details)
            logger.info(
                'Epoch %d gen loss %.3e disc loss %.3e', epoch,
                loss_details.get('train_loss_gen', np.nan),
                loss_details.get('train_loss_disc', np.nan))

            extras = {
                'weight_gen_advers': weight_gen_advers,
                'disc_loss_bound_0': disc_loss_bounds[0],
                'disc_loss_bound_1': disc_loss_bounds[1],
                'learning_rate_gen':
                    self._optimizer_config['learning_rate'],
                'learning_rate_disc':
                    self._optimizer_disc_config['learning_rate'],
                'train_gen': int(train_gen),
                'train_disc': int(train_disc),
            }
            weight_gen_advers = self.update_adversarial_weights(
                loss_details, adaptive_update_fraction,
                adaptive_update_bounds, weight_gen_advers, train_disc)

            row = {'elapsed_time': time.time() - t0, **loss_details,
                   **extras}
            if tb_writer is not None:
                from sup3r_tpu.models.utilities import tb_log_dict

                tb_log_dict(tb_writer, row, epoch)
            row_df = pd.DataFrame(row, index=[epoch])
            self._history = (row_df if len(self._history) == 0 else
                             pd.concat([self._history, row_df]))

            if early_stop_on is not None and early_stop_on in self._history:
                stop = self.early_stop(
                    self._history, early_stop_on,
                    threshold=early_stop_threshold,
                    n_epoch=early_stop_n_epoch)
            save_now = (
                stop or epoch == epochs[-1]
                or (checkpoint_int is not None
                    and (epoch % checkpoint_int) == 0))
            if save_now and out_dir is not None:
                self.save(out_dir.format(epoch=epoch))
            if stop:
                break
        if tb_writer is not None:
            tb_writer.close()
        if hasattr(batch_handler, 'stop'):
            batch_handler.stop()
