"""Static FLOP estimation by walking a function's jaxpr.

The axon TPU backend returns ``None`` from XLA's ``cost_analysis``, so
we count multiply-accumulate work ourselves from the traced program:
``conv_general_dilated`` and ``dot_general`` carry >99% of the FLOPs in
every model family here (conv/dense GANs). Elementwise work is ignored
(sub-1% and HBM-bound anyway). ``lax.cond`` branches are both counted,
a small overestimate for gated optimizer updates.

Used by bench.py to report achieved TFLOP/s / MFU (reference north
star: BASELINE.md; reference has no equivalent — TF profiler served
this role)."""

import numpy as np

__all__ = ['estimate_flops']


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _eqn_flops(eqn):
    prim = eqn.primitive.name
    if prim == 'conv_general_dilated':
        out = eqn.outvars[0].aval.shape
        rhs = eqn.invars[1].aval.shape
        dn = eqn.params['dimension_numbers']
        rhs_spec = dn.rhs_spec
        k_in = rhs[rhs_spec[1]]
        k_spatial = [rhs[i] for i in rhs_spec[2:]]
        return 2 * _prod(out) * int(k_in) * _prod(k_spatial)
    if prim == 'dot_general':
        (lc, rc), (lb, rb) = eqn.params['dimension_numbers']
        lhs = eqn.invars[0].aval.shape
        rhs = eqn.invars[1].aval.shape
        batch = _prod(lhs[i] for i in lb)
        k = _prod(lhs[i] for i in lc)
        m = _prod(lhs[i] for i in range(len(lhs))
                  if i not in lc and i not in lb)
        n = _prod(rhs[i] for i in range(len(rhs))
                  if i not in rc and i not in rb)
        return 2 * batch * m * n * k
    return 0


def _sub_jaxprs(params):
    import jax.extend as jex

    for v in params.values():
        vals = v if isinstance(v, (tuple, list)) else (v,)
        for x in vals:
            if isinstance(x, jex.core.ClosedJaxpr):
                yield x.jaxpr
            elif isinstance(x, jex.core.Jaxpr):
                yield x


def _jaxpr_flops(jaxpr):
    total = 0
    for eqn in jaxpr.eqns:
        total += _eqn_flops(eqn)
        for sub in _sub_jaxprs(eqn.params):
            total += _jaxpr_flops(sub)
    return total


def estimate_flops(fn, *args, **kwargs):
    """Total conv+matmul FLOPs of one call of ``fn(*args, **kwargs)``
    (abstract trace; nothing executes on device)."""
    import jax

    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_flops(closed.jaxpr)
