"""Quantile Delta Mapping math (Cannon et al. 2015), vectorized over
space columns.

Replaces rex.utilities.bc_utils.QuantileDeltaMapping (the reference
delegates to it at sup3r/bias/bias_transforms.py:622). Empirical CDFs
are N quantile x-values per spatial column with quantile y-values given
by a sampling scheme.
"""

import numpy as np


def sample_q_linear(n):
    """Evenly spaced quantiles including 0 and 1."""
    return np.linspace(0, 1, n)


def sample_q_log(n, log_base=10):
    """Quantiles concentrated near 0."""
    return (log_base ** np.linspace(0, 1, n) - 1) / (log_base - 1)


def sample_q_invlog(n, log_base=10):
    """Quantiles concentrated near 1."""
    return 1 - sample_q_log(n, log_base)[::-1]


def sampled_quantiles(n, sampling='linear', log_base=10):
    """Quantile y-values for the given sampling scheme."""
    sampling = str(sampling).casefold()
    if sampling == 'linear':
        return sample_q_linear(n)
    if sampling == 'log':
        return sample_q_log(n, log_base)
    if sampling == 'invlog':
        return sample_q_invlog(n, log_base)
    raise KeyError(f'Unknown sampling "{sampling}"')


def _interp_to_quantiles(x, xp_cols, quantiles):
    """CDF evaluation: for values ``x`` (T, S) against per-column
    x-values ``xp_cols`` (S, N) with shared ``quantiles`` (N,), return
    tau (T, S) by piecewise-linear interpolation (clipped to [0, 1])."""
    t, s = x.shape
    n = xp_cols.shape[-1]
    # count of xp <= x gives right-side index
    idx = np.sum(xp_cols[None, :, :] <= x[:, :, None], axis=-1)
    idx = np.clip(idx, 1, n - 1)
    x0 = np.take_along_axis(xp_cols, (idx - 1).T, axis=-1).T
    x1 = np.take_along_axis(xp_cols, idx.T, axis=-1).T
    q0 = quantiles[idx - 1]
    q1 = quantiles[idx]
    denom = np.where(x1 == x0, 1.0, x1 - x0)
    frac = np.clip((x - x0) / denom, 0, 1)
    return np.clip(q0 + frac * (q1 - q0), 0, 1)


def _interp_from_quantiles(tau, xp_cols, quantiles):
    """Inverse CDF: tau (T, S) -> values from per-column x-values."""
    n = xp_cols.shape[-1]
    idx = np.sum(quantiles[None, None, :] <= tau[:, :, None], axis=-1)
    idx = np.clip(idx, 1, n - 1)
    q0 = quantiles[idx - 1]
    q1 = quantiles[idx]
    x0 = np.take_along_axis(xp_cols, (idx - 1).T, axis=-1).T
    x1 = np.take_along_axis(xp_cols, idx.T, axis=-1).T
    denom = np.where(q1 == q0, 1.0, q1 - q0)
    frac = np.clip((tau - q0) / denom, 0, 1)
    return x0 + frac * (x1 - x0)


class QuantileDeltaMapping:
    """Empirical QDM transform over (time, space) arrays."""

    def __init__(self, params_oh, params_mh, params_mf=None,
                 dist='empirical', relative=True, sampling='linear',
                 log_base=10, delta_denom_min=None,
                 delta_denom_zero=None, delta_range=None):
        """params_*: (space, N) empirical CDF x-values for observed-
        historical, modeled-historical, modeled-future. ``params_mf``
        None (the no-trend case) defaults to ``params_mh`` — matching
        rex's QuantileDeltaMapping, which keeps the delta term so
        out-of-range values still scale/offset consistently
        (reference delegation: sup3r/bias/bias_transforms.py:586-591
        -> rex bc_utils)."""
        assert str(dist).casefold() == 'empirical', (
            'Only empirical distributions are implemented')
        self.params_oh = np.asarray(params_oh, dtype=np.float64)
        self.params_mh = np.asarray(params_mh, dtype=np.float64)
        self.params_mf = (self.params_mh if params_mf is None
                          else np.asarray(params_mf, dtype=np.float64))
        self.relative = relative
        self.quantiles = sampled_quantiles(
            self.params_oh.shape[-1], sampling, log_base)
        self.delta_denom_min = delta_denom_min
        self.delta_denom_zero = delta_denom_zero
        self.delta_range = delta_range

    def __call__(self, data):
        """data: (time, space) biased values -> corrected values."""
        data = np.asarray(data, dtype=np.float64)
        tau = _interp_to_quantiles(data, self.params_mf, self.quantiles)
        x_oh = _interp_from_quantiles(tau, self.params_oh,
                                      self.quantiles)
        x_mh = _interp_from_quantiles(tau, self.params_mh,
                                      self.quantiles)
        if self.relative:
            denom = x_mh
            if self.delta_denom_zero is not None:
                denom = np.where(denom == 0, self.delta_denom_zero,
                                 denom)
            if self.delta_denom_min is not None:
                denom = np.maximum(denom, self.delta_denom_min)
            with np.errstate(divide='ignore', invalid='ignore'):
                delta = data / denom
            # non-finite deltas (zero denominators) propagate so the
            # runtime transforms can raise like the reference
            # (bias_transforms.py:816-825) — NaN columns (invalid
            # gids) already yield NaN through x_oh either way
            if self.delta_range is not None:
                delta = np.clip(delta, *self.delta_range)
            out = x_oh * delta
        else:
            delta = data - x_mh
            if self.delta_range is not None:
                delta = np.clip(delta, *self.delta_range)
            out = x_oh + delta
        return out.astype(np.float32)


# ----------------------------------------------------------------------
# device (jax) variant: same piecewise-linear empirical QDM, fp32, one
# jitted dispatch — used by the batched all-gid bias calibrations
# (SURVEY §2.7 per-gid parallelism row; reference fans out a
# ProcessPoolExecutor instead, sup3r/bias/bias_calc.py:191-255).

def _jx_interp_to_quantiles(x, xp, q):
    """jax CDF evaluation for one column: values ``x`` (T,) against
    sorted x-values ``xp`` (N,) with quantile y-values ``q`` (N,)."""
    import jax.numpy as jnp

    n = xp.shape[0]
    idx = jnp.clip(jnp.searchsorted(xp, x, side='right'), 1, n - 1)
    x0 = xp[idx - 1]
    x1 = xp[idx]
    q0 = q[idx - 1]
    q1 = q[idx]
    denom = jnp.where(x1 == x0, 1.0, x1 - x0)
    frac = jnp.clip((x - x0) / denom, 0, 1)
    return jnp.clip(q0 + frac * (q1 - q0), 0, 1)


def _jx_interp_from_quantiles(tau, xp, q):
    """jax inverse CDF for one column."""
    import jax.numpy as jnp

    n = xp.shape[0]
    idx = jnp.clip(jnp.searchsorted(q, tau, side='right'), 1, n - 1)
    q0 = q[idx - 1]
    q1 = q[idx]
    x0 = xp[idx - 1]
    x1 = xp[idx]
    denom = jnp.where(q1 == q0, 1.0, q1 - q0)
    frac = jnp.clip((tau - q0) / denom, 0, 1)
    return x0 + frac * (x1 - x0)


def qdm_transform_device(data, params_oh, params_mh, params_mf,
                         quantiles, relative=True, delta_denom_min=None,
                         delta_denom_zero=None, delta_range=None):
    """Traceable QDM of per-column series (vmapped over columns).

    data: (C, T) biased values; params_*: (C, N) CDF x-values;
    quantiles: (N,). Returns corrected (C, T) float32. Mirrors
    :class:`QuantileDeltaMapping` (host/float64) at fp32 tolerance;
    NaN params rows (invalid gids / empty windows) propagate to NaN
    output like the host path."""
    import jax
    import jax.numpy as jnp

    quantiles = jnp.asarray(quantiles, dtype=jnp.float32)

    def one(col, oh, mh, mf):
        tau = _jx_interp_to_quantiles(col, mf, quantiles)
        x_oh = _jx_interp_from_quantiles(tau, oh, quantiles)
        x_mh = _jx_interp_from_quantiles(tau, mh, quantiles)
        if relative:
            denom = x_mh
            if delta_denom_zero is not None:
                denom = jnp.where(denom == 0, delta_denom_zero, denom)
            if delta_denom_min is not None:
                denom = jnp.maximum(denom, delta_denom_min)
            delta = col / denom
            # non-finite deltas propagate (see the host path): NaN
            # columns (invalid gids) yield NaN through x_oh either
            # way, and zero denominators must surface loudly
            if delta_range is not None:
                delta = jnp.clip(delta, *delta_range)
            return x_oh * delta
        delta = col - x_mh
        if delta_range is not None:
            delta = jnp.clip(delta, *delta_range)
        return x_oh + delta

    return jax.vmap(one)(data, params_oh, params_mh,
                         params_mf).astype(jnp.float32)
