"""Data-parallel training over a device mesh (8 virtual CPU devices)
and dual-resolution training."""

import jax
import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.parallel import get_mesh
from sup3r_tpu.preprocessing.batch_handlers import (
    BatchHandler,
    DualBatchHandler,
)
from sup3r_tpu.utilities.test_helpers import (
    make_fake_dset,
    make_fake_dual,
)
from tests.training.test_model_family import _small_disc, _small_gen_s


def test_mesh_data_parallel_training():
    """Training with an attached 8-device mesh runs and changes
    weights; loss values stay finite."""
    assert jax.device_count() >= 8
    features = ['u_100m', 'v_100m']
    handler = BatchHandler(
        [make_fake_dset((20, 20, 40), features)], batch_size=8,
        n_batches=2, s_enhance=2, t_enhance=1, sample_shape=(8, 8, 1))
    model = Sup3rGan(_small_gen_s(), _small_disc())
    model.init_weights((1, 4, 4, 2), (1, 8, 8, 2))
    model.attach_mesh(get_mesh(8))
    w_before = np.asarray(model.gen_params[0]['kernel']).copy()
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=None)
    w_after = np.asarray(model.gen_params[0]['kernel'])
    assert not np.allclose(w_before, w_after)
    assert np.isfinite(
        model.history['train_loss_gen'].values[-1])


def test_mesh_replicated_and_batch_sharded():
    """Params end up replicated and batches sharded over the mesh."""
    model = Sup3rGan(_small_gen_s(), _small_disc())
    model.init_weights((1, 4, 4, 2), (1, 8, 8, 2))
    mesh = get_mesh(8)
    model.attach_mesh(mesh)
    kernel = model.gen_params[0]['kernel']
    assert len(kernel.sharding.device_set) == 8
    batch = model._place_batch(np.zeros((8, 4, 4, 2), np.float32))
    assert len(batch.sharding.device_set) == 8
    # replicated param: every device holds the full array
    assert kernel.sharding.is_fully_replicated


def test_dual_batch_handler_training():
    """Training on pre-paired LR/HR data (DualBatchHandler)."""
    features = ['u_100m', 'v_100m']
    paired = make_fake_dual((12, 12, 30), 2, 1, features)
    handler = DualBatchHandler(
        [paired], batch_size=2, n_batches=2, s_enhance=2, t_enhance=1,
        sample_shape=(8, 8, 1))
    model = Sup3rGan(_small_gen_s(), _small_disc())
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=None)
    assert model.meta['s_enhance'] == 2
    assert np.isfinite(model.history['train_loss_gen'].values[-1])


def test_device_transform_training_matches_host():
    """device_transform=True (coarsening inside the jitted step) gives
    the same losses as host-side coarsening given the same samples."""
    from sup3r_tpu.utilities import RANDOM_GENERATOR

    features = ['u_100m', 'v_100m']
    data = make_fake_dset((20, 20, 40), features)

    def make_handler(device_transform):
        # reset rng so both handlers draw identical crops
        RANDOM_GENERATOR.bit_generator.state = np.random.default_rng(
            seed=0).bit_generator.state
        return BatchHandler(
            [data], batch_size=2, n_batches=2, s_enhance=2,
            t_enhance=1, sample_shape=(8, 8, 1),
            device_transform=device_transform)

    def train_one(handler):
        model = Sup3rGan(_small_gen_s(), _small_disc())
        model.init_weights((1, 4, 4, 2), (1, 8, 8, 2), seed=1)
        model.train(handler, input_resolution={'spatial': '30km',
                                               'temporal': '60min'},
                    n_epoch=1, out_dir=None)
        return model.history['train_loss_gen'].values[-1]

    loss_host = train_one(make_handler(False))
    loss_dev = train_one(make_handler(True))
    np.testing.assert_allclose(loss_dev, loss_host, rtol=1e-4)


def test_dual_pipeline_from_files(tmp_path):
    """The sup3rwind dual-resolution production flow from raw files:
    coarse NC (ERA-style) + fine H5 (WTK-style) -> DataHandlers ->
    DualRasterizer (IDW regrid of LR onto the coarsened-HR grid) ->
    DualBatchHandler -> short GAN train (reference:
    tests/training/test_train_dual.py)."""
    from sup3r_tpu.preprocessing import DataHandler
    from sup3r_tpu.preprocessing.rasterizers import DualRasterizer
    from sup3r_tpu.utilities.test_helpers import (
        make_fake_h5_file,
        make_fake_nc_file,
    )

    features = ['u_100m', 'v_100m']
    lr_fp = make_fake_nc_file(str(tmp_path / 'era.nc'), (10, 10, 20),
                              ['u100', 'v100'])
    hr_fp = make_fake_h5_file(str(tmp_path / 'wtk.h5'), (20, 20, 20),
                              features)
    lr_h = DataHandler(lr_fp, features=features)
    hr_h = DataHandler(hr_fp, features=features)
    paired = DualRasterizer((lr_h.data, hr_h.data), s_enhance=2,
                            t_enhance=1).data
    assert paired.low_res.shape[:2] == (10, 10)
    assert paired.high_res.shape[:2] == (20, 20)
    assert not np.isnan(paired.low_res.data).any()

    handler = DualBatchHandler(
        [paired], batch_size=2, n_batches=2, s_enhance=2, t_enhance=1,
        sample_shape=(8, 8, 1))
    model = Sup3rGan(_small_gen_s(), _small_disc())
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=None)
    assert np.isfinite(model.history['train_loss_gen'].values[-1])


def test_mesh_step_matches_single_device():
    """ONE train step on an 8-device mesh (sharded batch, replicated
    params, ICI all-reduce) produces the SAME losses and parameters as
    the identical step on one device — XLA's inserted collectives must
    be numerically transparent."""
    features = ['u_100m', 'v_100m']
    rng = np.random.default_rng(0)
    lr = rng.random((8, 4, 4, 2)).astype(np.float32)
    hr = rng.random((8, 8, 8, 2)).astype(np.float32)

    def one_step(use_mesh):
        model = Sup3rGan(_small_gen_s(), _small_disc(),
                         learning_rate=1e-3)
        model.init_weights((1, 4, 4, 2), (1, 8, 8, 2), seed=3)
        if use_mesh:
            model.attach_mesh(get_mesh(8))
        details = model.run_gradient_descent(
            lr, hr, train_gen=True, train_disc=True)
        return details, jax.tree.map(np.asarray, model.gen_params)

    d1, p1 = one_step(False)
    d8, p8 = one_step(True)
    for k in d1:
        np.testing.assert_allclose(d8[k], d1[k], rtol=2e-4, atol=1e-6)
    flat1 = jax.tree.leaves(p1)
    flat8 = jax.tree.leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6)


def test_mesh_bf16_step_matches_single_device():
    """train_dtype='bfloat16' composes with dp mesh sharding: the
    8-device bf16 step reproduces the single-device bf16 losses and
    params (the cast happens inside the per-shard computation; the
    grad all-reduce runs on the fp32 master-weight gradients)."""
    rng = np.random.default_rng(0)
    lr = rng.random((8, 4, 4, 2)).astype(np.float32)
    hr = rng.random((8, 8, 8, 2)).astype(np.float32)

    def one_step(use_mesh):
        model = Sup3rGan(_small_gen_s(), _small_disc(),
                         learning_rate=1e-3)
        model.train_dtype = 'bfloat16'
        model.init_weights((1, 4, 4, 2), (1, 8, 8, 2), seed=3)
        if use_mesh:
            model.attach_mesh(get_mesh(8))
        details = model.run_gradient_descent(
            lr, hr, train_gen=True, train_disc=True)
        return details, jax.tree.map(np.asarray, model.gen_params)

    d1, p1 = one_step(False)
    d8, p8 = one_step(True)
    for k in d1:
        np.testing.assert_allclose(d8[k], d1[k], rtol=1e-2, atol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        assert np.asarray(b).dtype == np.float32
        np.testing.assert_allclose(b, a, rtol=1e-2, atol=1e-4)


def test_mesh_2d_dp_sp_step_matches_single_device():
    """dp x sp COMPOSED training: a 4x2 mesh shards the batch over
    'data' and each sample's s1 dim over 'space' (XLA inserts conv
    halo exchanges on the spatial axis and the grad all-reduce over
    both). Losses and updated params must match the single-device
    step."""
    from sup3r_tpu.parallel import get_mesh_2d

    rng = np.random.default_rng(1)
    lr = rng.random((8, 8, 8, 2)).astype(np.float32)
    hr = rng.random((8, 16, 16, 2)).astype(np.float32)

    def one_step(mesh):
        model = Sup3rGan(_small_gen_s(), _small_disc(),
                         learning_rate=1e-3)
        model.init_weights((1, 8, 8, 2), (1, 16, 16, 2), seed=5)
        if mesh is not None:
            model.attach_mesh(mesh)
            assert model._mesh_spatial_axis == 'space'
        details = model.run_gradient_descent(
            lr, hr, train_gen=True, train_disc=True)
        return details, jax.tree.map(np.asarray, model.gen_params)

    d1, p1 = one_step(None)
    d2, p2 = one_step(get_mesh_2d(4, 2))
    for k in d1:
        np.testing.assert_allclose(d2[k], d1[k], rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6)


def test_mesh_2d_sharding_layout():
    """shard_batch_spatial places dim 0 on 'data' and dim 1 on
    'space'; uneven splits raise."""
    import pytest as _pytest

    from sup3r_tpu.parallel import get_mesh_2d, shard_batch_spatial

    mesh = get_mesh_2d(2, 4)
    arr = np.zeros((4, 8, 6, 2), np.float32)
    out = shard_batch_spatial(mesh, arr)
    assert len(out.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(2, 2, 6, 2)}
    with _pytest.raises(ValueError, match='not divisible'):
        shard_batch_spatial(mesh, np.zeros((3, 8, 6, 2), np.float32))
    with _pytest.raises(ValueError, match='not divisible'):
        shard_batch_spatial(mesh, np.zeros((4, 6, 6, 2), np.float32))
    # rank <= spatial_dim arrays (per-sample weights) shard batch-only
    full, wts = shard_batch_spatial(
        mesh, arr, np.zeros((4,), np.float32))
    assert {s.data.shape for s in wts.addressable_shards} == {(2,)}
    assert {s.data.shape
            for s in full.addressable_shards} == {(2, 2, 6, 2)}


def _fusable_gen_s(n_feats=2, mult=2):
    """Reference-style pad/conv/crop blocks so the train step carries
    FusedReflectConv layers (the shard-aligned formulation's target)."""
    return [
        {'class': 'FlexiblePadding',
         'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]],
         'mode': 'REFLECT'},
        {'class': 'Conv2D', 'filters': 8 * mult * mult,
         'kernel_size': 3, 'strides': 1},
        {'class': 'Cropping2D', 'cropping': 2},
        {'class': 'SpatialExpansion', 'spatial_mult': mult},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'FlexiblePadding',
         'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]],
         'mode': 'REFLECT'},
        {'class': 'Conv2D', 'filters': n_feats, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping2D', 'cropping': 2},
    ]


def test_mesh_2d_full_training_loop():
    """Full model.train() epoch loop on a composed dp x sp mesh: the
    epoch loop's _place_batch shards batches over 'data' AND each
    sample's s1 dim over the 4-wide 'space' axis, which auto-engages
    the shard-aligned conv formulation on the fused reflect-conv
    blocks (train_shard_aligned=None + >= 4-wide spatial axis)."""
    assert jax.device_count() >= 8
    from sup3r_tpu.parallel import get_mesh_2d

    features = ['u_100m', 'v_100m']
    handler = BatchHandler(
        [make_fake_dset((20, 20, 40), features)], batch_size=4,
        n_batches=2, s_enhance=2, t_enhance=1, sample_shape=(16, 16, 1))
    model = Sup3rGan(_fusable_gen_s(), _small_disc())
    model.init_weights((1, 8, 8, 2), (1, 16, 16, 2))
    model.attach_mesh(get_mesh_2d(2, 4))
    assert model._mesh_spatial_axis == 'space'
    assert model._auto_shard_aligned() is True
    w_before = np.asarray(model.gen_params[1]['kernel']).copy()
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=None)
    w_after = np.asarray(model.gen_params[1]['kernel'])
    assert not np.allclose(w_before, w_after)
    assert np.isfinite(model.history['train_loss_gen'].values[-1])
