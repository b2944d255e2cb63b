"""Training from the streaming (lazy) data plane: batches are
bit-identical to eager mode, a GAN trains end-to-end from a dataset
larger than an enforced host-RAM budget, and prefetch hides the disk
reads (reference mode='lazy' training from larger-than-RAM dask
stores, sup3r/preprocessing/batch_queues/abstract.py:135-141)."""

import numpy as np
import pytest

from sup3r_tpu.configs import get_config
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.preprocessing import BatchHandler, DataHandler
from sup3r_tpu.utilities.test_helpers import make_fake_h5_file
import sup3r_tpu.utilities.utilities as uu

FEATURES = ['u_100m', 'v_100m']


def _reseed():
    uu.RANDOM_GENERATOR.bit_generator.state = np.random.default_rng(
        seed=7).bit_generator.state


def _batch_handler(container, **kwargs):
    return BatchHandler(
        [container], batch_size=2, n_batches=4, s_enhance=2,
        t_enhance=2, sample_shape=(8, 8, 6), max_workers=1,
        queue_cap=2, **kwargs)


def test_lazy_batches_match_eager(tmp_path):
    """Same RNG seed + shared stats -> the queue over a lazy handler
    emits exactly the batches the eager handler's queue emits.

    Stats are passed explicitly (the production pattern: cached
    means/stds JSON): when computed from the data instead, the eager
    float32 reductions and the lazy float64 streaming accumulators
    agree only to ~1e-7 relative, which would break bit-parity."""
    path = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (16, 16, 40),
        ['windspeed_100m', 'winddirection_100m'], value_range=(0, 300))
    eager = DataHandler(path, features=FEATURES)
    lazy = DataHandler(path, features=FEATURES, mode='lazy')
    stats = dict(
        means={f: float(np.nanmean(eager.data[f])) for f in FEATURES},
        stds={f: float(np.nanstd(eager.data[f])) for f in FEATURES})

    _reseed()
    bh_eager = _batch_handler(eager, **stats)
    eager_batches = [(np.asarray(b.low_res), np.asarray(b.high_res))
                     for b in bh_eager]
    bh_eager.stop()

    _reseed()
    bh_lazy = _batch_handler(lazy, **stats)
    lazy_batches = [(np.asarray(b.low_res), np.asarray(b.high_res))
                    for b in bh_lazy]
    bh_lazy.stop()

    assert len(eager_batches) == len(lazy_batches) == 4
    for (elr, ehr), (llr, lhr) in zip(eager_batches, lazy_batches):
        np.testing.assert_array_equal(elr, llr)
        np.testing.assert_array_equal(ehr, lhr)


def test_train_from_larger_than_ram_store(tmp_path, monkeypatch):
    """End-to-end GAN training from a store that the eager path is
    FORBIDDEN to load (env-capped host RAM budget): the lazy handler
    streams sample windows, losses are finite, weights move, and the
    queue's starvation rate stays sane."""
    # 24*24*500*2 vars * 4B ≈ 2.3 MB of float32 — cap the budget at
    # 1 MB so an eager load of either variable must raise
    path = make_fake_h5_file(
        str(tmp_path / 'big.h5'), (24, 24, 500),
        ['windspeed_100m', 'winddirection_100m'], value_range=(0, 300))
    monkeypatch.setenv('SUP3R_TPU_HOST_RAM_GB', str(1 / 1024))
    with pytest.raises(MemoryError):
        DataHandler(path, features=FEATURES)
    handler = DataHandler(path, features=FEATURES, mode='lazy')

    _reseed()
    bh = _batch_handler(handler)
    model = Sup3rGan(
        get_config('spatiotemporal/gen_2x_2x_2f'),
        get_config('spatiotemporal/disc_test'), learning_rate=1e-4)
    model.train(bh, input_resolution={'spatial': '30km',
                                      'temporal': '60min'},
                n_epoch=2, weight_gen_advers=0.0, train_gen=True,
                train_disc=False,
                out_dir=str(tmp_path / 'gan_{epoch}'))
    assert len(model.history) == 2
    losses = model.history['train_loss_gen'].values
    assert np.all(np.isfinite(losses))
    # prefetch health: after warm-up the consumer shouldn't starve on
    # most fetches (lazy reads are tiny windows of a local file)
    assert bh._queue.starvation_rate <= 0.8
    bh.stop()
