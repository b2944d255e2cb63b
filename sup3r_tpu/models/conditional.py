"""Sup3rCondMom: conditional-moment (non-adversarial) estimator.

Trains a generator to predict conditional moments (e.g. E[HR|LR] or
E[(HR-E[HR|LR])^2|LR]) with a masked pointwise loss; targets and masks
are produced by the conditional batch queues.

Reference parity: sup3r/models/conditional.py:30-489.
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
from sup3r_tpu.models.gan import _make_optimizer

logger = logging.getLogger(__name__)


class Sup3rCondMom(AbstractSingleModel):
    """Conditional moment estimator (single network, masked loss)."""

    def __init__(self, gen_layers, optimizer=None, learning_rate=1e-4,
                 loss='MeanSquaredError', meta=None, means=None,
                 stdevs=None, name=None):
        super().__init__()
        self.name = name or type(self).__name__
        self._gen = self.load_network(gen_layers, 'generator')
        self._gen_config = self._gen.config
        if optimizer is None:
            optimizer = {'name': 'Adam', 'learning_rate': learning_rate}
        self._gen_tx, self._optimizer_config = _make_optimizer(optimizer)
        self.set_loss_function(loss)
        self.meta = meta if meta is not None else {}
        self.set_norm_stats(means, stdevs)
        self.gen_params = None
        self._gen_opt_state = None
        self._gen_in_shape = None
        self._train_step_fn = None
        self._gen_apply_fn = None
        self._train_record = None
        self.total_batches = 0
        self._init_key = jax.random.PRNGKey(42)

    # ------------------------------------------------------------------
    def init_weights(self, lr_shape, hr_shape=None, seed=None):
        """Initialize generator params for the given input shape."""
        if seed is not None:
            self._init_key = jax.random.PRNGKey(seed)
        if self.gen_params is None:
            self.gen_params, _ = self._gen.init(self._init_key, lr_shape)
            self._gen_in_shape = tuple(lr_shape)
            self._gen_opt_state = self._gen_tx.init(self.gen_params)

    @property
    def generator(self):
        return self._gen

    def update_optimizer(self, **kwargs):
        """Update optimizer config (e.g. learning_rate) mid-training;
        moment state is preserved (reference: conditional.py:158)."""
        cfg = {**self._optimizer_config, **kwargs}
        self._gen_tx, self._optimizer_config = _make_optimizer(cfg)
        self._train_step_fn = None  # step closure captured the old tx

    def calc_loss(self, output_true, output_gen, mask):
        """Masked pointwise loss (reference: conditional.py:222-283)."""
        output_gen = self._combine_loss_input(output_true, output_gen)
        if output_gen.shape != output_true.shape:
            raise RuntimeError(
                f'Generated shape {output_gen.shape} != target '
                f'{output_true.shape}')
        loss = self.loss_fun(output_gen * mask, output_true * mask)
        return loss, {'loss_gen': loss}

    def _build_train_step(self):
        gen = self._gen
        loss_fun = self.loss_fun
        gen_tx = self._gen_tx
        n_exo = len(self.hr_exo_features)
        exo_names = list(self.hr_exo_features)

        def split_exo(hr):
            if n_exo == 0:
                return {}
            n_out = hr.shape[-1] - n_exo
            return {f: hr[..., n_out + i:n_out + i + 1]
                    for i, f in enumerate(exo_names)}

        gen_apply = self._maybe_remat(self._train_gen_apply())
        # mixed precision (train_dtype): bf16 net, fp32 loss — same
        # boundary-cast recipe as gan.py _make_gen_loss_fn
        tdt, _cast_net = self._train_cast()

        def loss_fn(gen_params, lr, hr, output, mask):
            gp, (lr_c,) = _cast_net(gen_params, lr)
            exo = split_exo(hr)
            if tdt is not None:
                exo = {k: v.astype(tdt) for k, v in exo.items()}
            out = gen_apply(gp, lr_c, exo=exo).astype(jnp.float32)
            if n_exo:
                # append the TARGET's exo channels so out matches the
                # queue's full-feature target/mask and the exo term is
                # identically zero (reference _combine_loss_input pulls
                # from hi_res_true=batch.output — for Mom2-style
                # queues the target's exo channels are transformed, so
                # pulling from hr would add a spurious loss term)
                out = jnp.concatenate(
                    [out, output[..., out.shape[-1]:]], axis=-1)
            return loss_fun(out * mask, output * mask)

        def step(gen_params, gen_opt, lr, hr, output, mask):
            loss, grads = jax.value_and_grad(loss_fn)(
                gen_params, lr, hr, output, mask)
            updates, new_opt = gen_tx.update(grads, gen_opt, gen_params)
            new_params = optax.apply_updates(gen_params, updates)
            return new_params, new_opt, {'loss_gen': loss}

        self._loss_fn = loss_fn
        return jax.jit(step, donate_argnums=(0, 1))

    @property
    def train_step_fn(self):
        if self._train_step_fn is None:
            self._train_step_fn = self._build_train_step()
        return self._train_step_fn

    def run_gradient_descent(self, batch):
        """One optimization step on a conditional batch (low_res,
        high_res, output, mask)."""
        mask = batch.mask
        output = batch.output
        (self.gen_params, self._gen_opt_state,
         details) = self.train_step_fn(
            self.gen_params, self._gen_opt_state,
            jnp.asarray(batch.low_res, jnp.float32),
            jnp.asarray(batch.high_res, jnp.float32),
            jnp.asarray(output, jnp.float32),
            jnp.asarray(mask, jnp.float32))
        return {k: float(v) for k, v in details.items()}

    # ------------------------------------------------------------------
    def _get_gen_apply(self):
        if self._gen_apply_fn is None:
            apply = self._train_gen_apply()  # pad/crop fusion
            self._gen_apply_fn = jax.jit(
                lambda p, x, exo: apply(p, x, exo=exo))
        return self._gen_apply_fn

    def generate(self, low_res, norm_in=True, un_norm_out=True,
                 exogenous_data=None):
        """Moment prediction in physical units."""
        low_res = np.asarray(low_res, dtype=np.float32)
        low_res = self._combine_fwp_input(low_res, exogenous_data)
        exo = {}
        if exogenous_data:
            for feat, val in exogenous_data.items():
                if isinstance(val, dict) and 'steps' in val:
                    for s in val['steps']:
                        if s.get('combine_type') == 'layer':
                            exo[feat] = jnp.asarray(s['data'])
                else:
                    exo[feat] = jnp.asarray(np.asarray(val))
        if norm_in and self._means is not None:
            low_res = self.norm_input(low_res)
        if self.gen_params is None:
            self.init_weights(low_res.shape)
        out = np.asarray(self._get_gen_apply()(
            self.gen_params, jnp.asarray(low_res), exo))
        if un_norm_out and self._means is not None:
            out = self.un_norm_output(out)
        return out

    # ------------------------------------------------------------------
    @property
    def model_params(self):
        params = super().model_params
        params.update({
            'gen_config': self._gen_config,
            'gen_in_shape': self._gen_in_shape,
            'optimizer': self._optimizer_config,
        })
        return params

    def save(self, out_dir):
        """Save to a directory (model_gen.msgpack + params json)."""
        os.makedirs(out_dir, exist_ok=True)
        if self.gen_params is not None:
            self.save_network_params(
                self.gen_params, os.path.join(out_dir,
                                              'model_gen.msgpack'))
            if self._gen_opt_state is not None:
                self.save_network_params(
                    self._gen_opt_state,
                    os.path.join(out_dir, 'opt_state.msgpack'))
        self.save_params(out_dir)
        self.save_history(out_dir)

    @classmethod
    def load(cls, model_dir, verbose=True):
        """Load a saved conditional model."""
        params = cls.load_saved_params(model_dir, verbose=verbose)
        model = cls(params['gen_config'],
                    optimizer=params.get('optimizer'),
                    loss=params.get('loss', 'MeanSquaredError'),
                    meta=params.get('meta', {}),
                    means=params.get('means'),
                    stdevs=params.get('stdevs'))
        if params.get('gen_in_shape') is not None:
            model.init_weights(tuple(params['gen_in_shape']))
            model.gen_params = cls.load_network_params(
                model.gen_params,
                os.path.join(model_dir, 'model_gen.msgpack'))
            fp_opt = os.path.join(model_dir, 'opt_state.msgpack')
            if os.path.exists(fp_opt):
                model._gen_opt_state = cls.load_network_params(
                    model._gen_opt_state, fp_opt)
        fp_history = os.path.join(model_dir, 'history.csv')
        if os.path.exists(fp_history):
            model._history = pd.read_csv(fp_history, index_col=0)
        return model

    # ------------------------------------------------------------------
    def calc_val_loss(self, batch_handler):
        """Mean validation loss over val batches."""
        val = getattr(batch_handler, 'val_data', None)
        if val is None or (hasattr(val, '__len__') and len(val) == 0):
            return {}
        losses = []
        for batch in val:
            out = self._get_gen_apply()(
                self.gen_params,
                jnp.asarray(batch.low_res, jnp.float32),
                self._split_exo_dict(batch.high_res))
            loss, _ = self.calc_loss(
                jnp.asarray(batch.output, jnp.float32), out,
                jnp.asarray(batch.mask, jnp.float32))
            losses.append(float(loss))
        return {'val_loss_gen': float(np.mean(losses))}

    def _split_exo_dict(self, hr):
        exo = {}
        n_exo = len(self.hr_exo_features)
        if n_exo:
            hr = jnp.asarray(hr)
            n_out = hr.shape[-1] - n_exo
            for i, f in enumerate(self.hr_exo_features):
                exo[f] = hr[..., n_out + i:n_out + i + 1]
        return exo

    def train(self, batch_handler, input_resolution, n_epoch,
              checkpoint_int=None, out_dir='./cond_mom_{epoch}',
              early_stop_on=None, early_stop_threshold=0.005,
              early_stop_n_epoch=5, multi_gpu=False,
              tensorboard_log=False):
        """Train the conditional moment estimator (reference:
        conditional.py:315-480)."""
        self.set_norm_stats(batch_handler.means, batch_handler.stds)
        params = {
            k: getattr(batch_handler, k, None)
            for k in ['smoothing', 'lr_features', 'hr_exo_features',
                      'hr_out_features', 'smoothed_features']
            if hasattr(batch_handler, k)}
        self.set_model_params(
            input_resolution=input_resolution,
            s_enhance=batch_handler.s_enhance,
            t_enhance=batch_handler.t_enhance, **params)
        self.init_weights((1, *batch_handler.lr_shape))

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
        for epoch in epochs:
            batch_losses = []
            for batch in batch_handler:
                details = self.run_gradient_descent(batch)
                batch_losses.append(details['loss_gen'])
            loss_details = {
                'train_loss_gen': float(np.mean(batch_losses))}
            loss_details.update(self.calc_val_loss(batch_handler))
            logger.info('Epoch %d cond-mom loss %.3e', epoch,
                        loss_details['train_loss_gen'])
            if tb_writer is not None:
                from sup3r_tpu.models.utilities import tb_log_dict

                tb_log_dict(tb_writer, loss_details, epoch)
            row = pd.DataFrame(
                {'elapsed_time': time.time() - t0, **loss_details},
                index=[epoch])
            self._history = (row if len(self._history) == 0 else
                             pd.concat([self._history, row]))
            stop = False
            if early_stop_on is not None and (
                    early_stop_on in self._history):
                stop = self.early_stop(self._history, early_stop_on,
                                       early_stop_threshold,
                                       early_stop_n_epoch)
            if out_dir is not None and (
                    stop or epoch == epochs[-1]
                    or (checkpoint_int is not None
                        and epoch % checkpoint_int == 0)):
                self.save(out_dir.format(epoch=epoch))
            if stop:
                break
        if tb_writer is not None:
            tb_writer.close()
        if hasattr(batch_handler, 'stop'):
            batch_handler.stop()
