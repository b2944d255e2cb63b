"""SolarCC: special solar GAN trained on daily->hourly clearsky ratio.

Loss structure (reference: sup3r/models/solar_cc.py:31-250):
  * discriminator sees only daylight-hour windows (true: fixed daylight
    slice per day; generated: a randomly shifted window per day)
  * generator content loss = pointwise loss on the 2 center hours +
    loss on (daylight-mean true vs 24h-mean generated)
  * output temporal axis is cropped by the network and reflect-padded
    back to t_in * t_enhance at generate time.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from sup3r_tpu.models.gan import Sup3rGan, relativistic_disc_loss
from sup3r_tpu.ops.losses import apply_loss

logger = logging.getLogger(__name__)


class SolarCC(Sup3rGan):
    """Solar climate-change GAN with daylight-window losses."""

    #: zero-indexed hour daylight starts (after t_roll centering)
    STARTING_HOUR = 8
    #: number of daylight hours per day used for the disc
    DAYLIGHT_HOURS = 8
    #: center-of-day hours used for the pointwise content loss
    POINT_LOSS_HOURS = 2

    def __init__(self, *args, t_enhance=None, **kwargs):
        super().__init__(*args, **kwargs)
        self._t_enhance_override = t_enhance
        if t_enhance is not None:
            self.meta['t_enhance'] = t_enhance

    def init_weights(self, lr_shape, hr_shape, seed=None):
        """The discriminator only ever consumes DAYLIGHT_HOURS-long
        windows, so initialize it on that temporal length."""
        hr_shape = (*hr_shape[:3], self.DAYLIGHT_HOURS, hr_shape[-1])
        super().init_weights(lr_shape, hr_shape, seed=seed)

    def _make_gen_loss_fn(self):
        disc = self._disc
        gen_apply = self._maybe_remat(self._train_gen_apply())
        loss_fun = self.loss_fun
        sh, dh, plh = (self.STARTING_HOUR, self.DAYLIGHT_HOURS,
                       self.POINT_LOSS_HOURS)
        # same dropout plumbing as the base Sup3rGan loss fns
        # (gan.py _make_gen_loss_fn): activate only when the nets
        # carry Dropout layers so remat stays compatible otherwise
        gen_do = any(type(l).__name__ == 'Dropout'
                     for l in self._gen.layers)
        disc_do = any(type(l).__name__ == 'Dropout'
                      for l in disc.layers)
        # mixed precision (train_dtype): bf16 nets, fp32 losses —
        # same boundary-cast recipe as gan.py _make_gen_loss_fn
        tdt, _cast_net = self._train_cast()

        def gen_loss_fn(gen_params, disc_params, lr, hr, w_adv, key):
            assert hr.shape[3] % 24 == 0, (
                f'SolarCC needs multiples of 24 hourly steps, got '
                f'{hr.shape}')
            key, k_g = jax.random.split(key)
            gkw = ({'train': True, 'dropout_key': k_g}
                   if gen_do else {})
            gp, (lr_c,) = _cast_net(gen_params, lr)
            out = gen_apply(gp, lr_c, **gkw).astype(jnp.float32)
            dp, _ = _cast_net(disc_params)
            n_days = hr.shape[3] // 24

            def dkw():
                nonlocal key
                if not disc_do:
                    return {}
                key, k_d = jax.random.split(key)
                return {'train': True, 'dropout_key': k_d}

            d_true, d_gen = [], []
            content = 0.0
            for i in range(n_days):
                base = 24 * i
                # random daylight window for the generated sample
                key, sub = jax.random.split(key)
                t0 = jax.random.randint(sub, (), 0,
                                        hr.shape[3] - dh + 1)
                gen_win = jax.lax.dynamic_slice_in_dim(out, t0, dh,
                                                       axis=3)
                _, (gw_c,) = _cast_net(None, gen_win)
                d_gen.append(disc.apply(dp, gw_c, **dkw())
                             .astype(jnp.float32))
                # fixed daylight window for the true sample
                true_sub = hr[:, :, :, base + sh:base + sh + dh, :]
                _, (ts_c,) = _cast_net(None, true_sub)
                d_true.append(disc.apply(dp, ts_c, **dkw())
                              .astype(jnp.float32))

                # content: center-hours pointwise + daily-mean match
                p0 = base + (24 - plh) // 2
                key, k_l1, k_l2 = jax.random.split(key, 3)
                content += apply_loss(
                    loss_fun, out[:, :, :, p0:p0 + plh, :],
                    hr[:, :, :, p0:p0 + plh, :], key=k_l1)
                true_mean = jnp.mean(true_sub, axis=3)
                gen_mean = jnp.mean(out[:, :, :, base:base + 24, :],
                                    axis=3)
                content += apply_loss(loss_fun, gen_mean, true_mean,
                                      key=k_l2)
            content = content / n_days
            d_true = jnp.concatenate(d_true, axis=0)
            d_gen = jnp.concatenate(d_gen, axis=0)
            advers = relativistic_disc_loss(d_gen, d_true)
            loss = content + w_adv * advers
            aux = {'content': content, 'advers': advers,
                   'hi_res_gen': out, 'd_true': d_true, 'd_gen': d_gen}
            return loss, aux

        return gen_loss_fn

    def _make_disc_loss_fn(self):
        disc = self._disc
        sh, dh = self.STARTING_HOUR, self.DAYLIGHT_HOURS
        disc_do = any(type(l).__name__ == 'Dropout'
                      for l in disc.layers)
        _, _cast_net = self._train_cast()

        def disc_loss_fn(disc_params, hr, hi_res_gen, key):
            disc_params, (hr, hi_res_gen) = _cast_net(
                disc_params, hr, hi_res_gen)
            n_days = hr.shape[3] // 24
            d_true, d_gen = [], []

            def dkw():
                nonlocal key
                if not disc_do:
                    return {}
                key, k_d = jax.random.split(key)
                return {'train': True, 'dropout_key': k_d}

            for i in range(n_days):
                base = 24 * i
                key, sub = jax.random.split(key)
                t0 = jax.random.randint(sub, (), 0,
                                        hi_res_gen.shape[3] - dh + 1)
                gen_win = jax.lax.dynamic_slice_in_dim(
                    hi_res_gen, t0, dh, axis=3)
                d_gen.append(disc.apply(disc_params, gen_win, **dkw()))
                d_true.append(disc.apply(
                    disc_params, hr[:, :, :, base + sh:base + sh + dh,
                                    :], **dkw()))
            return relativistic_disc_loss(
                jnp.concatenate(d_true, axis=0).astype(jnp.float32),
                jnp.concatenate(d_gen, axis=0).astype(jnp.float32))

        return disc_loss_fn

    def _get_val_step_fn(self):
        """Jitted validation step with SolarCC's daylight-window
        semantics (the base class's generic val step scores the full
        24-hour window, which both diverges from the training loss
        and hands a 24h tensor to a discriminator initialized on
        DAYLIGHT_HOURS-long inputs). Mirrors the eager ``calc_loss``:
        FIXED daylight windows for true AND generated samples (the
        train step randomizes the generated window; validation is
        deterministic), center-hour pointwise + daily-mean content
        terms, and the generate-time reflect pad restoring the full
        temporal length."""
        if getattr(self, '_val_step_fn', None) is None:
            gen_apply = self._get_gen_apply()
            disc = self._disc
            loss_fun = self.loss_fun
            sh, dh, plh = (self.STARTING_HOUR, self.DAYLIGHT_HOURS,
                          self.POINT_LOSS_HOURS)

            def val_step(gen_params, disc_params, lr, hr, w_adv, key):
                assert hr.shape[3] % 24 == 0, (
                    f'SolarCC needs multiples of 24 hourly steps, '
                    f'got {hr.shape}')
                exo = self._split_exo_traced(hr)
                exo = self._augment_val_exo(hr, exo, key)
                out = gen_apply(gen_params, lr, exo)
                t_pad = (hr.shape[3] - out.shape[3]) // 2
                if t_pad > 0:
                    # temporal_pad equivalent, in-graph (static width)
                    out = jnp.pad(
                        out, ((0, 0), (0, 0), (0, 0), (t_pad, t_pad),
                              (0, 0)), mode='reflect')
                n_days = hr.shape[3] // 24
                d_true, d_gen = [], []
                content = 0.0
                for i in range(n_days):
                    base = 24 * i
                    true_sub = hr[:, :, :, base + sh:base + sh + dh, :]
                    d_true.append(disc.apply(disc_params, true_sub))
                    d_gen.append(disc.apply(
                        disc_params,
                        out[:, :, :, base + sh:base + sh + dh, :]))
                    p0 = base + (24 - plh) // 2
                    content += loss_fun(out[:, :, :, p0:p0 + plh, :],
                                        hr[:, :, :, p0:p0 + plh, :])
                    content += loss_fun(
                        jnp.mean(out[:, :, :, base:base + 24, :],
                                 axis=3),
                        jnp.mean(true_sub, axis=3))
                content = content / n_days
                d_true = jnp.concatenate(d_true, axis=0)
                d_gen = jnp.concatenate(d_gen, axis=0)
                advers = relativistic_disc_loss(d_gen, d_true)
                return {
                    'loss_disc': relativistic_disc_loss(d_true, d_gen),
                    'loss_gen': content + w_adv * advers,
                    'loss_gen_content': content,
                    'loss_gen_advers': advers,
                }

            self._val_step_fn = jax.jit(val_step)
        return self._val_step_fn

    def calc_loss(self, hi_res_true, hi_res_gen, weight_gen_advers=0.001,
                  train_gen=True, train_disc=False, compute_disc=False):
        """Daylight-window loss for validation (eager path; fixed
        windows — the deterministic counterpart of the train loss)."""
        assert hi_res_true.shape[3] % 24 == 0

        loss, aux = None, {}
        details = {}
        disc = self._disc
        sh, dh = self.STARTING_HOUR, self.DAYLIGHT_HOURS
        n_days = hi_res_true.shape[3] // 24
        d_true, d_gen = [], []
        content = 0.0
        for i in range(n_days):
            base = 24 * i
            true_sub = hi_res_true[:, :, :, base + sh:base + sh + dh, :]
            d_true.append(disc.apply(self.disc_params, true_sub))
            d_gen.append(disc.apply(
                self.disc_params,
                hi_res_gen[:, :, :, base + sh:base + sh + dh, :]))
            p0 = base + (24 - self.POINT_LOSS_HOURS) // 2
            p1 = p0 + self.POINT_LOSS_HOURS
            content += self.loss_fun(hi_res_gen[:, :, :, p0:p1, :],
                                     hi_res_true[:, :, :, p0:p1, :])
            content += self.loss_fun(
                jnp.mean(hi_res_gen[:, :, :, base:base + 24, :], axis=3),
                jnp.mean(true_sub, axis=3))
        content = content / n_days
        d_true = jnp.concatenate(d_true, axis=0)
        d_gen = jnp.concatenate(d_gen, axis=0)
        if compute_disc or train_disc:
            details['loss_disc'] = relativistic_disc_loss(d_true, d_gen)
        if train_gen:
            advers = relativistic_disc_loss(d_gen, d_true)
            loss = content + weight_gen_advers * advers
            details.update(loss_gen=loss, loss_gen_content=content,
                           loss_gen_advers=advers)
        elif train_disc:
            loss = details['loss_disc']
        return loss, details

    def temporal_pad(self, low_res, hi_res, mode='reflect'):
        """Reflect-pad output time axis to t_in * t_enhance (reference:
        solar_cc.py:253-297)."""
        t_shape = low_res.shape[-2] * self.t_enhance
        t_pad = int((t_shape - hi_res.shape[-2]) / 2)
        if t_pad > 0:
            pad_width = ((0, 0), (0, 0), (0, 0), (t_pad, t_pad), (0, 0))
            hi_res = np.pad(hi_res, pad_width, mode=mode)
        return hi_res

    def generate(self, low_res, **kwargs):
        """Generate + pad the temporal axis back to full length."""
        out = super().generate(low_res, **kwargs)
        return self.temporal_pad(low_res, out)

    @classmethod
    def load(cls, model_dir, t_enhance=None, verbose=True):
        """Load with optional t_enhance override."""
        model = super().load(model_dir, verbose=verbose)
        if t_enhance is not None:
            model._t_enhance_override = t_enhance
            model.meta['t_enhance'] = t_enhance
        return model
