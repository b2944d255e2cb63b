"""General batch-handler behavior (mirrors reference
tests/batch_handlers/test_bh_general.py:115-440): multi-container
normalization stats, explicit means/stds override, smoothing
transform, validation batches, and temporal coarsening methods."""

import numpy as np
import pytest

from sup3r_tpu.ops import temporal_coarsening
from sup3r_tpu.preprocessing.batch_handlers import BatchHandler
from sup3r_tpu.utilities.test_helpers import make_fake_dset

FEATURES = ['u_100m', 'v_100m']


def test_bad_sample_shapes_rejected_at_construction():
    """Samplers with inconsistent sample shapes fail queue
    construction, not mid-producer-thread (reference:
    tests/batch_queues/test_bq_general.py:256-285)."""
    from sup3r_tpu.preprocessing.batch_queues import SingleBatchQueue
    from sup3r_tpu.preprocessing.samplers import Sampler

    s1 = Sampler(make_fake_dset((10, 10, 20), FEATURES),
                 sample_shape=(4, 4, 5))
    s2 = Sampler(make_fake_dset((12, 12, 15), FEATURES),
                 sample_shape=(3, 3, 5))
    with pytest.raises(AssertionError, match='sample_shape'):
        SingleBatchQueue([s1, s2], s_enhance=1, t_enhance=1,
                         batch_size=4, n_batches=3)
    # mismatched feature lists are equally fatal
    s3 = Sampler(make_fake_dset((10, 10, 20), FEATURES[:1]),
                 sample_shape=(4, 4, 5))
    with pytest.raises(AssertionError, match='feature'):
        SingleBatchQueue([s1, s3], s_enhance=1, t_enhance=1,
                         batch_size=4, n_batches=3)


def test_multi_container_normalization_stats():
    """means/stds are size-weighted across containers and match the
    pooled data (reference: test_bh_general.py:190-307)."""
    a = make_fake_dset((10, 10, 30), FEATURES)
    b = make_fake_dset((10, 10, 90), FEATURES)
    # pool BEFORE construction: the handler normalizes containers
    # in place
    pooled = {
        f: np.concatenate([np.asarray(a[f]).ravel(),
                           np.asarray(b[f]).ravel()])
        for f in FEATURES}
    handler = BatchHandler([a, b], batch_size=1, n_batches=1,
                           s_enhance=2, t_enhance=1,
                           sample_shape=(8, 8, 1))
    for f in FEATURES:
        np.testing.assert_allclose(handler.means[f],
                                   pooled[f].mean(), rtol=1e-4)
        np.testing.assert_allclose(handler.stds[f],
                                   pooled[f].std(), rtol=2e-2)
    handler.stop()


def test_explicit_stats_override():
    """User-provided means/stds short-circuit computation and are used
    for normalization."""
    data = make_fake_dset((10, 10, 30), FEATURES)
    raw_max = float(np.asarray(data.data).max())
    means = {f: 0.5 for f in FEATURES}
    stds = {f: 2.0 for f in FEATURES}
    handler = BatchHandler([data], batch_size=2, n_batches=1,
                           s_enhance=2, t_enhance=1,
                           sample_shape=(8, 8, 1), means=means,
                           stds=stds)
    assert handler.means == means and handler.stds == stds
    batch = next(iter(handler))
    # normalized with std 2 and mean 0.5: values shrink accordingly
    assert np.asarray(batch.high_res).max() <= (raw_max - 0.5) / 2.0 \
        + 1e-5
    handler.stop()


def test_smoothing_changes_low_res_only():
    """transform_kwargs smoothing gaussian-filters the coarsened LR
    batch; HR stays raw (reference: test_bh_general.py:403-440)."""
    data = make_fake_dset((12, 12, 24), FEATURES)
    kw = dict(batch_size=2, n_batches=1, s_enhance=2, t_enhance=1,
              sample_shape=(8, 8, 1), means={f: 0.0 for f in FEATURES},
              stds={f: 1.0 for f in FEATURES})
    plain = BatchHandler([data], **kw)
    smooth = BatchHandler([data], transform_kwargs={'smoothing': 0.6},
                          **kw)
    b1 = next(iter(plain))
    b2 = next(iter(smooth))
    plain.stop()
    smooth.stop()
    assert b1.low_res.shape == b2.low_res.shape
    # same sampler data distribution; smoothing reduces LR variance
    assert np.std(np.asarray(b2.low_res)) < 1.05 * np.std(
        np.asarray(b1.low_res))
    # smoothed lr equals gaussian filter of coarsened hr for the same
    # batch: verify the op itself round-trips through the queue
    from sup3r_tpu.ops import spatial_coarsening

    hr = np.asarray(b2.high_res)
    lr_manual = spatial_coarsening(hr, 2)
    from sup3r_tpu.ops.coarsen import smooth_data

    sm = smooth_data(lr_manual, FEATURES, [], 0.6)
    assert sm.shape == b2.low_res.shape


def test_validation_batches_from_val_containers():
    """val_containers feed a separate queue of the same batch shape."""
    train = make_fake_dset((12, 12, 24), FEATURES)
    val = make_fake_dset((12, 12, 12), FEATURES)
    handler = BatchHandler([train], val_containers=[val], batch_size=2,
                           n_batches=2, s_enhance=2, t_enhance=1,
                           sample_shape=(8, 8, 1))
    assert handler.val_data is not None
    vb = next(iter(handler.val_data))
    tb = next(iter(handler))
    assert vb.low_res.shape == tb.low_res.shape
    assert vb.high_res.shape == tb.high_res.shape
    handler.stop()


@pytest.mark.parametrize('method', ['subsample', 'average', 'total',
                                    'min', 'max'])
def test_temporal_coarsening_methods_in_queue(method):
    """Every temporal coarsening method runs through the handler and
    matches the standalone op."""
    data = make_fake_dset((12, 12, 24), FEATURES)
    handler = BatchHandler(
        [data], batch_size=1, n_batches=1, s_enhance=1, t_enhance=4,
        sample_shape=(8, 8, 8),
        means={f: 0.0 for f in FEATURES},
        stds={f: 1.0 for f in FEATURES},
        transform_kwargs={'temporal_coarsening_method': method})
    batch = next(iter(handler))
    handler.stop()
    hr = np.asarray(batch.high_res)
    expected = temporal_coarsening(hr, 4, method)
    np.testing.assert_allclose(np.asarray(batch.low_res), expected,
                               rtol=1e-5, atol=1e-6)


def test_multi_container_sampling_proportional_to_size():
    """The queue draws from containers proportional to data size
    (reference: collections/base.py:53 container_weights)."""
    from sup3r_tpu.preprocessing.batch_queues import SingleBatchQueue
    from sup3r_tpu.preprocessing.samplers import Sampler

    small = make_fake_dset((10, 10, 20), FEATURES)
    big = make_fake_dset((10, 10, 80), FEATURES)
    # tag the containers with distinct constant values
    small.data[:] = 1.0
    big.data[:] = 2.0
    samplers = [Sampler(small, sample_shape=(4, 4, 1), batch_size=1),
                Sampler(big, sample_shape=(4, 4, 1), batch_size=1)]
    queue = SingleBatchQueue(samplers, batch_size=1, n_batches=1,
                             s_enhance=1, t_enhance=1)
    w = queue.container_weights
    np.testing.assert_allclose(w, [0.2, 0.8], atol=1e-6)
    counts = {1.0: 0, 2.0: 0}
    for _ in range(200):
        s = queue.get_random_container()
        counts[float(np.asarray(s.data.data).flat[0])] += 1
    frac_big = counts[2.0] / 200
    assert 0.68 < frac_big < 0.92  # ~0.8 +/- sampling noise


def test_partial_stats_warn_and_complete():
    """User stats covering only SOME features warn and the missing
    features are computed — a partial dict must never silently
    normalize the uncovered features with (0, 1) (reference:
    tests/batch_handlers/test_bh_general.py:167
    test_not_enough_stats)."""
    import pytest as _pytest

    data = make_fake_dset((12, 12, 20), ['u_100m', 'v_100m'])
    with _pytest.warns(UserWarning, match='computing the missing'):
        bh = BatchHandler(
            [data], batch_size=2, n_batches=1, s_enhance=2,
            t_enhance=1, sample_shape=(8, 8, 1), queue_cap=2,
            means={'u_100m': 4.0}, stds={'u_100m': 2.0}, mode='eager')
    assert bh.means['u_100m'] == 4.0
    assert bh.stds['u_100m'] == 2.0
    assert 'v_100m' in bh.means and bh.means['v_100m'] != 0.0
    assert 'v_100m' in bh.stds and bh.stds['v_100m'] != 1.0
    bh.stop()


def test_batch_sampling_workers_epoch():
    """max_workers > 1 keeps several batch productions in flight and
    a full epoch still yields exactly n_batches well-formed batches
    (reference: tests/batch_handlers/test_bh_general.py:33
    test_batch_sampling_workers; before round 3 the worker pool was
    created but never used)."""
    data = make_fake_dset((16, 16, 30), ['u_100m', 'v_100m'])
    bh = BatchHandler([data], batch_size=4, n_batches=6, s_enhance=2,
                      t_enhance=1, sample_shape=(8, 8, 1), queue_cap=3,
                      max_workers=3, means=None, stds=None,
                      mode='eager')
    seen = 0
    for batch in bh:
        assert batch.low_res.shape == (4, 4, 4, 2)
        assert batch.high_res.shape == (4, 8, 8, 2)
        assert np.isfinite(batch.low_res).all()
        seen += 1
    assert seen == 6
    # second epoch works too (producer restartable)
    assert sum(1 for _ in bh) == 6
    bh.stop()


def test_queue_kwargs_collision_is_loud():
    """queue_kwargs entries shadowing dedicated handler arguments must
    raise a descriptive error, not an opaque 'multiple values for
    keyword argument' TypeError (round-5 review)."""
    data = make_fake_dset((10, 10, 20), FEATURES)
    with pytest.raises(ValueError, match='collide'):
        BatchHandler([data], batch_size=2, n_batches=1, s_enhance=1,
                     t_enhance=1, sample_shape=(4, 4, 5),
                     queue_kwargs={'batch_size': 8})


def test_conditional_queue_rejects_device_transform():
    """Conditional-moment queues build mask/output targets on the
    host; device_transform=True must raise, not become a silent no-op
    with a stale model transform config (round-5 review)."""
    from sup3r_tpu.preprocessing.batch_handlers import BatchHandlerMom1

    data = make_fake_dset((10, 10, 20), FEATURES)
    with pytest.raises(NotImplementedError, match='device_transform'):
        BatchHandlerMom1([data], batch_size=2, n_batches=1,
                         s_enhance=2, t_enhance=1,
                         sample_shape=(4, 4, 1),
                         device_transform=True)


def test_next_detects_dead_producer():
    """next(queue) must surface a dead producer as the diagnostic
    RuntimeError (like iteration does), not hang then raise a bare
    queue.Empty; starvation accounting must tick for next()-style
    consumers too (round-5 review)."""
    from sup3r_tpu.preprocessing.batch_queues import SingleBatchQueue
    from sup3r_tpu.preprocessing.samplers import Sampler

    s = Sampler(make_fake_dset((10, 10, 20), FEATURES),
                sample_shape=(4, 4, 5))
    q = SingleBatchQueue([s], s_enhance=1, t_enhance=1, batch_size=2,
                         n_batches=2)
    # healthy path: next() yields and counts the get
    batch = next(q)
    assert batch.high_res.shape[0] == 2
    assert q._gets == 1
    q.stop()
    # dead-producer path: break the sampler, restart, expect the
    # diagnostic error (the producer thread dies on first produce)
    q.samplers[0].sample_shape = None
    with pytest.raises((RuntimeError, StopIteration)):
        next(q)
    q.stop()


def test_random_generator_thread_safety():
    """The shared RANDOM_GENERATOR serializes draws: hammering it from
    many threads stays in-range and error-free (numpy Generators are
    not thread-safe bare; round-5 review), and tests can still reseed
    via bit_generator.state."""
    import threading

    from sup3r_tpu.utilities import RANDOM_GENERATOR

    errs = []

    def hammer():
        try:
            for _ in range(200):
                v = RANDOM_GENERATOR.integers(0, 10)
                assert 0 <= v < 10
                RANDOM_GENERATOR.choice(5, p=[0.2] * 5)
        except Exception as e:  # pragma: no cover - failure capture
            errs.append(e)

    threads = [threading.Thread(target=hammer) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # reseed contract: same state -> same draw
    state = np.random.default_rng(7).bit_generator.state
    RANDOM_GENERATOR.bit_generator.state = state
    a = RANDOM_GENERATOR.random(3)
    RANDOM_GENERATOR.bit_generator.state = state
    b = RANDOM_GENERATOR.random(3)
    np.testing.assert_array_equal(a, b)
