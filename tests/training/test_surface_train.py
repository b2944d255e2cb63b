"""SurfaceSpatialMetModel.train(): RH delta-weight regression.

Reference parity: sup3r/models/surface.py:735-827 — coarsen the true HR
fields, re-upscale with LANCZOS, regress the RH residual on the
(delta-temp, delta-topo) residuals with zero intercept.
"""

import numpy as np
import pytest

from sup3r_tpu.models.surface import SurfaceSpatialMetModel

FEATURES = ['temperature_2m', 'relativehumidity_2m', 'pressure_0m']
S_ENHANCE = 4


def _smooth_field(rng, shape):
    """A smooth random field (low-frequency cosines + noise)."""
    s1, s2 = shape[:2]
    yy, xx = np.meshgrid(np.linspace(0, 1, s1), np.linspace(0, 1, s2),
                         indexing='ij')
    out = np.zeros(shape, dtype=np.float64)
    for k in range(shape[-1] if len(shape) == 3 else 1):
        a, b, c, d = rng.uniform(-1, 1, 4)
        field = (a * np.cos(2 * np.pi * (xx + c))
                 + b * np.cos(2 * np.pi * (yy + d))
                 + 0.05 * rng.normal(size=(s1, s2)))
        if len(shape) == 3:
            out[..., k] = field
        else:
            out = field
    return out


def _reconstruct(model, hr_field):
    """coarsen -> LANCZOS upscale, per day (what train() subtracts)."""
    from sup3r_tpu.ops import spatial_coarsening
    lr = spatial_coarsening(hr_field, s_enhance=S_ENHANCE, obs_axis=False)
    return np.stack(
        [model.downscale_arr(np.asarray(lr[..., i]), S_ENHANCE)
         for i in range(lr.shape[-1])], axis=-1)


def test_train_recovers_known_weights():
    """Construct true_hr_rh as a fixpoint so its residual is EXACTLY a
    known linear combination of the temp/topo residuals; the fit must
    recover those weights to float precision."""
    rng = np.random.default_rng(42)
    shape = (24, 24, 3)
    w_t, w_z = -2.5, -0.02

    true_hr_temp = 15 + 8 * _smooth_field(rng, shape)
    topo = 500 + 400 * _smooth_field(rng, shape[:2])
    topo_days = np.repeat(topo[..., None], shape[-1], axis=-1)

    model = SurfaceSpatialMetModel(FEATURES, s_enhance=S_ENHANCE)
    x1 = true_hr_temp - _reconstruct(model, true_hr_temp)
    x2 = topo_days - _reconstruct(model, topo_days)
    target_y = w_t * x1 + w_z * x2

    # fixpoint: rh = reconstruct(rh) + target_y  =>  residual -> target_y
    # (convergence floors at downscale_arr's float32 quantization, so
    # the recovered weights carry ~0.004 / 3e-5 error; tolerances below
    # give ~5x margin over three seeds' measured worst case)
    rh = 50 + 10 * _smooth_field(rng, shape)
    for _ in range(120):
        rh = _reconstruct(model, rh) + target_y
    resid = rh - _reconstruct(model, rh)
    assert np.max(np.abs(resid - target_y)) < 0.1

    w_dt, w_dz, regr, x, y = model.train(
        true_hr_temp, rh, topo,
        input_resolution={'spatial': '12km', 'temporal': '60min'})

    assert np.isclose(w_dt, w_t, atol=0.02)
    assert np.isclose(w_dz, w_z, atol=2e-4)
    # regr object semantics: zero intercept, predict = x @ coef
    assert regr.intercept_ == 0.0
    assert np.allclose(regr.predict(x[:10]), x[:10] @ regr.coef_)
    assert x.shape == (np.prod(shape), 2)
    assert y.shape == (np.prod(shape),)
    # input_resolution recorded on meta (reference surface.py:775)
    assert model.meta['input_resolution'] == {'spatial': '12km',
                                              'temporal': '60min'}


def test_train_shape_validation():
    model = SurfaceSpatialMetModel(FEATURES, s_enhance=2)
    good3 = np.zeros((8, 8, 2))
    good2 = np.zeros((8, 8))
    with pytest.raises(AssertionError):
        model.train(good2, good3, good2, {})
    with pytest.raises(AssertionError):
        model.train(good3, good2, good2, {})
    with pytest.raises(AssertionError):
        model.train(good3, good3, good3, {})


def test_train_then_generate_uses_fitted_weights():
    """Reference workflow: train -> construct a new model with the
    fitted weights -> generate. The RH output must reflect the fitted
    weights (differ from the default-weight model)."""
    rng = np.random.default_rng(7)
    shape = (20, 20, 2)
    true_hr_temp = 10 + 5 * _smooth_field(rng, shape)
    true_hr_rh = np.clip(60 + 15 * _smooth_field(rng, shape), 0, 100)
    topo = 300 * (1 + _smooth_field(rng, shape[:2]))

    model = SurfaceSpatialMetModel(FEATURES, s_enhance=S_ENHANCE)
    w_dt, w_dz, *_ = model.train(
        true_hr_temp, true_hr_rh, topo,
        input_resolution={'spatial': '4km', 'temporal': '60min'})
    assert np.isfinite(w_dt) and np.isfinite(w_dz)

    fitted = SurfaceSpatialMetModel(
        FEATURES, s_enhance=S_ENHANCE, w_delta_temp=w_dt,
        w_delta_topo=w_dz)
    assert fitted._w_delta_temp == w_dt
    assert fitted._w_delta_topo == w_dz

    from sup3r_tpu.ops import spatial_coarsening
    lr = np.stack([
        spatial_coarsening(true_hr_temp[..., 0][..., None], S_ENHANCE,
                           obs_axis=False)[..., 0],
        spatial_coarsening(true_hr_rh[..., 0][..., None], S_ENHANCE,
                           obs_axis=False)[..., 0],
        np.full((shape[0] // S_ENHANCE, shape[1] // S_ENHANCE), 1e5),
    ], axis=-1)[None]
    topo_lr = spatial_coarsening(topo[..., None], S_ENHANCE,
                                 obs_axis=False)[..., 0]
    exo = {'topography': {'steps': [{'data': topo_lr}, {'data': topo}]}}

    out_fit = fitted.generate(lr, exogenous_data=exo)
    out_def = model.generate(lr, exogenous_data=exo)
    assert out_fit.shape == (1, *shape[:2], 3)
    # temperature/pressure channels identical (untouched by RH weights)
    assert np.array_equal(out_fit[..., 0], out_def[..., 0])
    assert np.array_equal(out_fit[..., 2], out_def[..., 2])
    assert not np.array_equal(out_fit[..., 1], out_def[..., 1])
