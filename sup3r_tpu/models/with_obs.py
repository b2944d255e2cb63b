"""Sup3rGanWithObs: GAN with synthetic sparse-observation fusion.

During training, random subsets of the true high-res field are exposed
to the generator as "observations" (through Sup3rConcatObs /
Sup3rObsModel layers) and an extra content-loss term rewards fidelity
at observed locations.

Reference parity: sup3r/models/with_obs.py:29-291. Masks are sampled
in-graph with jax.random (spatial fraction drawn from the configured
onshore bounds) so the whole step stays one compiled program.
"""

import logging

import jax
import jax.numpy as jnp

from sup3r_tpu.models.gan import Sup3rGan, relativistic_disc_loss
from sup3r_tpu.names import strip_obs_suffix
from sup3r_tpu.ops.losses import apply_loss

logger = logging.getLogger(__name__)


def _masked_mae(a, b, weights):
    """MAE over elements where weights == 1 (shape-static masking)."""
    w = weights.astype(a.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(jnp.abs(a - b) * w) / denom


class Sup3rGanWithObs(Sup3rGan):
    """GAN with observation fusion layers + obs content loss."""

    def __init__(self, *args, onshore_obs_frac=None,
                 offshore_obs_frac=None, loss_obs=None,
                 loss_obs_weight=0.1, **kwargs):
        """onshore_obs_frac / offshore_obs_frac: dicts with
        'spatial_frac' (float or [lo, hi] bounds) and optional
        'time_frac'. loss_obs is restricted to elementwise mae here."""
        super().__init__(*args, **kwargs)
        self.onshore_obs_frac = onshore_obs_frac or {}
        self.offshore_obs_frac = offshore_obs_frac or {}
        self.loss_obs_weight = loss_obs_weight
        self.loss_obs_name = loss_obs or 'MeanAbsoluteError'

    # shared suffix-strip rule: names.strip_obs_suffix
    _strip_obs = staticmethod(strip_obs_suffix)

    @property
    def obs_training_inds(self):
        """HR channel indices matched to each obs feature."""
        hr_feats = [self._strip_obs(f) for f in self.hr_features]
        return [hr_feats.index(self._strip_obs(f))
                for f in self.obs_features]

    def _get_val_step_fn(self):
        """Jitted validation step carrying the SAME obs terms as the
        training loss (the base class's generic val step injected
        masked obs exo but dropped ``obs_weight * loss_obs`` from
        loss_gen/loss_gen_content and never reported val_loss_obs —
        the reference routes validation through the shared
        ``_get_hr_exo_and_loss``, with_obs.py:245-279, so train and
        val losses are commensurate)."""
        if getattr(self, '_val_step_fn', None) is None:
            gen_apply = self._get_gen_apply()
            disc = self._disc
            loss_fun = self.loss_fun
            n_exo = len(self.hr_exo_features)
            slc = slice(0, -n_exo) if n_exo else slice(None)
            obs_weight = self.loss_obs_weight
            obs_names = list(self._gen.obs_features)
            obs_inds = self.obs_training_inds

            def val_step(gen_params, disc_params, lr, hr, w_adv, key):
                exo = self._split_exo_traced(hr)
                n_out_ch = hr.shape[-1] - n_exo
                not_obs = self._sample_obs_mask(
                    key, (*hr.shape[:-1], n_out_ch))
                # same mask-channel convention as the train loss fn
                for name, idx in zip(obs_names, obs_inds):
                    chan = hr[..., idx:idx + 1]
                    exo[name] = jnp.where(not_obs[..., :1], jnp.nan,
                                          chan)
                out = gen_apply(gen_params, lr, exo)
                full = self._combine_loss_input(hr, out)
                d_true = disc.apply(disc_params, hr)
                d_gen = disc.apply(disc_params, full)
                content = loss_fun(full[..., slc], hr[..., slc])
                advers = relativistic_disc_loss(d_gen, d_true)
                obs_w = (~not_obs).astype(out.dtype)
                loss_obs = _masked_mae(out, hr[..., slc], obs_w)
                loss_non_obs = _masked_mae(
                    out, hr[..., slc], not_obs.astype(out.dtype))
                content_tot = content + obs_weight * loss_obs
                return {
                    'loss_disc': relativistic_disc_loss(d_true, d_gen),
                    'loss_gen': content_tot + w_adv * advers,
                    'loss_gen_content': content_tot,
                    'loss_gen_advers': advers,
                    'loss_obs': loss_obs,
                    'loss_non_obs': loss_non_obs,
                    'obs_frac': jnp.mean(obs_w),
                }

            self._val_step_fn = jax.jit(val_step)
        return self._val_step_fn

    def _spatial_frac_bounds(self):
        frac = self.onshore_obs_frac.get('spatial_frac', 0.1)
        if isinstance(frac, (int, float)):
            return float(frac), float(frac)
        return float(frac[0]), float(frac[1])

    def _sample_obs_mask(self, key, hr_shape):
        """True where NOT observed. Spatial mask is constant over time
        (matching the reference's per-gid observation pattern)."""
        lo, hi = self._spatial_frac_bounds()
        time_frac = float(self.onshore_obs_frac.get('time_frac', 1.0))
        k1, k2, k3 = jax.random.split(key, 3)
        frac = jax.random.uniform(k1, (), minval=lo, maxval=hi)
        s_mask = jax.random.uniform(k2, hr_shape[1:3]) <= frac
        if len(hr_shape) == 5:
            t_mask = jax.random.uniform(k3, (hr_shape[3],)) <= time_frac
            mask = s_mask[:, :, None] & t_mask[None, None, :]
            mask = jnp.broadcast_to(mask[None, ..., None], hr_shape)
        else:
            mask = jnp.broadcast_to(
                s_mask[None, ..., None], hr_shape)
        return ~mask

    def _make_gen_loss_fn(self):
        disc = self._disc
        gen_apply = self._maybe_remat(self._train_gen_apply())
        loss_fun = self.loss_fun
        n_exo = len(self.hr_exo_features)
        exo_names = list(self.hr_exo_features)
        obs_names = list(self._gen.obs_features)
        obs_inds = self.obs_training_inds
        n_out = len(self.hr_out_features) if self.hr_out_features else \
            None
        split_exo = self._split_exo_traced
        obs_weight = self.loss_obs_weight
        # dropout plumbing mirrors the base gan.py loss fns
        gen_do = any(type(l).__name__ == 'Dropout'
                     for l in self._gen.layers)
        disc_do = any(type(l).__name__ == 'Dropout'
                      for l in disc.layers)
        # mixed precision (train_dtype): bf16 nets, fp32 losses —
        # same boundary-cast recipe as gan.py _make_gen_loss_fn
        tdt, _cast_net = self._train_cast()

        def gen_loss_fn(gen_params, disc_params, lr, hr, w_adv, key):
            key, k_g, k_d1, k_d2, k_loss = jax.random.split(key, 5)
            exo = split_exo(hr)
            n_out_ch = hr.shape[-1] - n_exo
            obs_mask_shape = (*hr.shape[:-1], n_out_ch)
            not_obs = self._sample_obs_mask(key, obs_mask_shape)
            # build NaN-masked obs inputs from the true HR data. The
            # mask is identical across channels (reference
            # with_obs.py:133-135 broadcasts one spatial mask over
            # n_out_features channels and slices [..., :n_obs]), so
            # use channel 0 — indexing by the HR channel idx would
            # run past the mask for obs features whose base is
            # exo-only (idx >= n_out_ch; round-3 review finding)
            for name, idx in zip(obs_names, obs_inds):
                chan = hr[..., idx:idx + 1]
                exo[name] = jnp.where(not_obs[..., :1], jnp.nan, chan)
            gkw = ({'train': True, 'dropout_key': k_g}
                   if gen_do else {})
            gp, (lr_c,) = _cast_net(gen_params, lr)
            exo_c = (exo if tdt is None
                     else {k: v.astype(tdt) for k, v in exo.items()})
            out = gen_apply(gp, lr_c, exo=exo_c, **gkw)
            out = out.astype(jnp.float32)
            full = (jnp.concatenate(
                [out] + [hr[..., hr.shape[-1] - n_exo + i:
                            hr.shape[-1] - n_exo + i + 1]
                         for i in range(n_exo)], axis=-1)
                if n_exo else out)
            d1kw = ({'train': True, 'dropout_key': k_d1}
                    if disc_do else {})
            d2kw = ({'train': True, 'dropout_key': k_d2}
                    if disc_do else {})
            dp, (hr_c, full_c) = _cast_net(disc_params, hr, full)
            d_true = disc.apply(dp, hr_c, **d1kw).astype(jnp.float32)
            d_gen = disc.apply(dp, full_c, **d2kw).astype(jnp.float32)
            slc = slice(0, -n_exo) if n_exo else slice(None)
            content = apply_loss(loss_fun, out, hr[..., slc],
                                 key=k_loss)
            advers = relativistic_disc_loss(d_gen, d_true)
            obs_w = (~not_obs).astype(out.dtype)
            loss_obs = _masked_mae(out, hr[..., slc], obs_w)
            loss_non_obs = _masked_mae(out, hr[..., slc],
                                       not_obs.astype(out.dtype))
            loss = content + w_adv * advers + obs_weight * loss_obs
            aux = {'content': content + obs_weight * loss_obs,
                   'advers': advers, 'hi_res_gen': full,
                   'loss_obs': loss_obs, 'loss_non_obs': loss_non_obs,
                   'obs_frac': jnp.mean(obs_w)}
            return loss, aux

        return gen_loss_fn

    @property
    def model_params(self):
        params = super().model_params
        params.update({
            'onshore_obs_frac': self.onshore_obs_frac,
            'offshore_obs_frac': self.offshore_obs_frac,
            'loss_obs_weight': self.loss_obs_weight,
            'loss_obs': self.loss_obs_name,
        })
        return params

    @classmethod
    def _extra_load_kwargs(cls, params):
        """Restore the observation settings alongside the base GAN
        state (the base ``load`` also restores optimizer state and
        training history, which the previous standalone override
        silently dropped)."""
        return {
            'onshore_obs_frac': params.get('onshore_obs_frac'),
            'offshore_obs_frac': params.get('offshore_obs_frac'),
            'loss_obs': params.get('loss_obs'),
            'loss_obs_weight': params.get('loss_obs_weight', 0.1),
        }
