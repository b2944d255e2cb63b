"""Asynchronous batch queues: host prefetch threads feeding the train
loop.

The reference fills a tf.queue.FIFOQueue from producer threads
(reference: sup3r/preprocessing/batch_queues/abstract.py:30-364). Here
a plain ``queue.Queue`` of numpy batches is filled by a producer thread
pool; the HR->LR coarsening transform runs on host numpy (cheap
reshape-means) so the device only ever sees final (lr, hr) pairs —
and the jitted train step overlaps with the next batch's production.
"""

import logging
import threading
from collections import namedtuple
from concurrent.futures import ThreadPoolExecutor
from queue import Empty, Full, Queue

import numpy as np

from sup3r_tpu.ops import (
    smooth_data,
    spatial_coarsening,
    temporal_coarsening,
)
from sup3r_tpu.utilities import RANDOM_GENERATOR

logger = logging.getLogger(__name__)

Batch = namedtuple('Batch', ['low_res', 'high_res'])
BatchWithObs = namedtuple('BatchWithObs', ['low_res', 'high_res', 'obs'])
#: raw HR sample batch for device-side transforms (one H2D transfer;
#: the jitted train step derives the LR input on device)
RawBatch = namedtuple('RawBatch', ['sample'])


class AbstractBatchQueue:
    """Prefetching batch queue over one or more samplers."""

    BATCH_CLASS = Batch

    def __init__(self, samplers, batch_size=16, n_batches=64,
                 s_enhance=1, t_enhance=1, queue_cap=4, max_workers=1,
                 transform_kwargs=None, mode='eager', thread_name='training'):
        """``mode`` is accepted for reference-config compatibility and
        is a no-op at the QUEUE level: laziness lives in the dataset
        here — build the containers with ``DataHandler(mode='lazy')``
        and the samplers' window reads stream from disk inside these
        producer threads (the reference defers dask compute to sample
        time instead, batch_queues/abstract.py:135-141)."""
        self.samplers = samplers
        self.batch_size = batch_size
        self.n_batches = n_batches
        self.s_enhance = s_enhance
        self.t_enhance = t_enhance
        self.queue = Queue(maxsize=queue_cap)
        self.max_workers = max_workers
        self.transform_kwargs = transform_kwargs or {}
        self._training_flag = threading.Event()
        self._thread = None
        self._pool = None
        self._thread_name = thread_name
        #: consumer-side wait accounting: how often the train loop
        #: found the queue empty (prefetch failing to hide producer
        #: latency — the metric the lazy data plane is judged by)
        self._gets = 0
        self._starved_waits = 0

    # ------------------------------------------------------------------
    @property
    def container_weights(self):
        """Sampling probability per sampler, proportional to data size
        (reference: collections/base.py:53)."""
        sizes = [s.data.size for s in self.samplers]
        total = sum(sizes)
        return np.array([s / total for s in sizes])

    def get_random_container(self):
        """Pick a sampler weighted by its data size."""
        if len(self.samplers) == 1:
            return self.samplers[0]
        from sup3r_tpu.preprocessing.samplers import _safe_probs

        idx = RANDOM_GENERATOR.choice(
            len(self.samplers), p=_safe_probs(self.container_weights))
        return self.samplers[idx]

    def sample_batch(self):
        """Draw batch_size HR samples from a random sampler and stack."""
        sampler = self.get_random_container()
        samples = [next(sampler) for _ in range(self.batch_size)]
        return self._stack(samples)

    def _stack(self, samples):
        return np.stack(samples, axis=0)

    def transform(self, samples):
        """Produce the final (low_res, high_res) pair. Abstract."""
        raise NotImplementedError

    def post_proc(self, samples):
        """samples -> Batch namedtuple."""
        lr, hr = self.transform(samples, **self.transform_kwargs)
        return self.BATCH_CLASS(low_res=lr, high_res=hr)

    # ------------------------------------------------------------------
    # threading
    def start(self):
        """Start the producer thread."""
        if self._thread is not None and self._thread.is_alive():
            return
        self._training_flag.set()
        self._pool = ThreadPoolExecutor(max_workers=self.max_workers)
        self._thread = threading.Thread(
            target=self._enqueue_batches,
            name=f'{self._thread_name}_queue', daemon=True)
        self._thread.start()

    def stop(self):
        """Stop the producer and drain the queue."""
        self._training_flag.clear()
        while True:
            try:
                self.queue.get_nowait()
            except Empty:
                break
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def _enqueue_batches(self):
        """Producer loop. ``max_workers > 1`` keeps that many batch
        productions in flight on the pool (the reference parallelizes
        sample collection the same way, batch_queues/abstract.py:262)
        — before round 3 the pool was created but never submitted to,
        so the knob was silently a no-op."""
        def produce():
            return self.post_proc(self.sample_batch())

        pending = []
        try:
            while self._training_flag.is_set():
                while (len(pending) < max(self.max_workers, 1)
                       and self._training_flag.is_set()):
                    pending.append(self._pool.submit(produce))
                fut = pending.pop(0)
                try:
                    batch = fut.result()
                except Exception:
                    logger.exception('Batch producer error')
                    raise
                while self._training_flag.is_set():
                    try:
                        self.queue.put(batch, timeout=0.2)
                        break
                    except Full:
                        continue
        finally:
            for fut in pending:
                fut.cancel()

    def __len__(self):
        return self.n_batches

    @property
    def starvation_rate(self):
        """Fraction of batch fetches that found the queue empty (0.0 =
        prefetch fully hides production latency)."""
        if self._gets == 0:
            return 0.0
        return self._starved_waits / self._gets

    def __iter__(self):
        self.start()
        for _ in range(self.n_batches):
            starved = False
            while True:
                try:
                    batch = self.queue.get(timeout=1.0)
                    self._gets += 1
                    self._starved_waits += int(starved)
                    yield batch
                    break
                except Empty:
                    starved = True
                    if not self._training_flag.is_set():
                        return
                    if (self._thread is None
                            or not self._thread.is_alive()):
                        raise RuntimeError(
                            'Batch producer thread died (see "Batch '
                            'producer error" traceback in the log)')

    def __next__(self):
        self.start()
        starved = False
        while True:
            try:
                batch = self.queue.get(timeout=1.0)
                self._gets += 1
                self._starved_waits += int(starved)
                return batch
            except Empty:
                # same diagnostics as __iter__: a dead producer must
                # point at its traceback, not hang then raise a bare
                # queue.Empty; starvation accounting stays correct for
                # next()-style consumers
                starved = True
                if not self._training_flag.is_set():
                    raise StopIteration
                if (self._thread is None
                        or not self._thread.is_alive()):
                    raise RuntimeError(
                        'Batch producer thread died (see "Batch '
                        'producer error" traceback in the log)')


class SingleBatchQueue(AbstractBatchQueue):
    """Queue producing (lr, hr) by coarsening sampled HR data
    (reference: batch_queues/base.py:30-86).

    With ``device_transform=True`` the queue yields raw HR samples
    (RawBatch) and the model's jitted train step performs the
    coarsening on device — one H2D transfer instead of two, and no
    host CPU spent on the transform."""

    def __init__(self, samplers, device_transform=False, **kwargs):
        self.device_transform = device_transform
        super().__init__(samplers, **kwargs)
        s = self.samplers[0]
        self.features = s.features
        self.lr_features = s.lr_features
        self.hr_exo_features = s.hr_exo_features
        self.hr_out_features = s.hr_out_features
        self.hr_features_ind = s.hr_features_ind
        self.sample_shape = s.sample_shape
        self._is_4d = self.sample_shape[2] == 1 and self.t_enhance == 1
        # fail at construction, not in the producer thread (reference:
        # batch_queues/abstract.py preflight asserts)
        bad = [tuple(x.sample_shape) for x in self.samplers
               if tuple(x.sample_shape) != tuple(self.sample_shape)]
        assert not bad, (
            'All samplers in a queue must share one sample_shape; got '
            f'{tuple(self.sample_shape)} and {bad}')
        bad_feats = [list(x.features) for x in self.samplers
                     if list(x.features) != list(self.features)]
        assert not bad_feats, (
            'All samplers in a queue must share one feature list; got '
            f'{list(self.features)} and {bad_feats}')
        assert self.sample_shape[0] % self.s_enhance == 0 and (
            self.sample_shape[1] % self.s_enhance == 0), (
            f's_enhance={self.s_enhance} must evenly divide the '
            f'spatial sample shape {self.sample_shape[:2]}')
        assert self._is_4d or (
            self.t_enhance <= self.sample_shape[2]
            and self.sample_shape[2] % self.t_enhance == 0), (
            f't_enhance={self.t_enhance} must evenly divide the '
            f'temporal sample shape {self.sample_shape[2]}')

    @property
    def lr_shape(self):
        """(s1, s2[, t], f) of one LR observation."""
        s1 = self.sample_shape[0] // self.s_enhance
        s2 = self.sample_shape[1] // self.s_enhance
        t = self.sample_shape[2] // self.t_enhance
        nf = len(self.lr_features)
        return (s1, s2, nf) if self._is_4d else (s1, s2, t, nf)

    @property
    def hr_shape(self):
        """(s1, s2[, t], f) of one HR observation."""
        s1, s2, t = self.sample_shape
        nf = len(self.hr_features_ind)
        return (s1, s2, nf) if self._is_4d else (s1, s2, t, nf)

    def transform(self, samples, smoothing=None, smoothing_ignore=None,
                  temporal_coarsening_method='subsample'):
        """HR batch (n, s1, s2, t, f) -> (lr, hr) pair."""
        lr = spatial_coarsening(samples, self.s_enhance)
        if self.t_enhance > 1:
            lr = temporal_coarsening(lr, self.t_enhance,
                                     temporal_coarsening_method)
        if smoothing is not None:
            lr = smooth_data(np.array(lr), self.features,
                             smoothing_ignore or [], smoothing)
        hr = samples[..., self.hr_features_ind]
        if self._is_4d:
            lr = lr[:, :, :, 0, :]
            hr = hr[:, :, :, 0, :]
        return np.ascontiguousarray(lr), np.ascontiguousarray(hr)

    @property
    def transform_config(self):
        """Static description of the HR->LR transform for device-side
        execution by the train step."""
        return {
            's_enhance': self.s_enhance,
            't_enhance': self.t_enhance,
            'method': self.transform_kwargs.get(
                'temporal_coarsening_method', 'subsample'),
            'hr_features_ind': tuple(self.hr_features_ind),
            'squeeze_time': self._is_4d,
        }

    def post_proc(self, samples):
        if self.device_transform:
            if self.transform_kwargs.get('smoothing'):
                raise NotImplementedError(
                    'smoothing is a host-side transform; use '
                    'device_transform=False with smoothing')
            return RawBatch(sample=np.ascontiguousarray(samples))
        return super().post_proc(samples)


class DualBatchQueue(AbstractBatchQueue):
    """Queue for pre-paired (lr, hr[, obs]) samples (reference:
    batch_queues/dual.py:14)."""

    def __init__(self, samplers, **kwargs):
        super().__init__(samplers, **kwargs)
        s = self.samplers[0]
        self.lr_features = s.lr_features
        self.hr_exo_features = s.hr_exo_features
        self.hr_out_features = s.hr_out_features
        self.features = s.features
        self.sample_shape = s.hr_sample_shape
        self._has_obs = getattr(s, 'obs_data', None) is not None
        self._is_4d = self.sample_shape[2] == 1 and self.t_enhance == 1
        self._check_enhancement_factors()

    def _check_enhancement_factors(self):
        for s in self.samplers:
            assert s.s_enhance == self.s_enhance
            assert s.t_enhance == self.t_enhance
            assert tuple(s.hr_sample_shape) == tuple(
                self.sample_shape), (
                'All dual samplers in a queue must share one '
                f'hr_sample_shape; got {tuple(self.sample_shape)} and '
                f'{tuple(s.hr_sample_shape)}')

    @property
    def lr_shape(self):
        s = self.samplers[0]
        shp = (*s.lr_sample_shape, len(self.lr_features))
        return (shp[0], shp[1], shp[3]) if self._is_4d else shp

    @property
    def hr_shape(self):
        s = self.samplers[0]
        shp = (*s.hr_sample_shape, len(s.hr_features))
        return (shp[0], shp[1], shp[3]) if self._is_4d else shp

    def _stack(self, samples):
        """samples are (lr, hr[, obs]) tuples — stack each member."""
        members = list(zip(*samples))
        return tuple(np.stack(m, axis=0) for m in members)

    def transform(self, samples, smoothing=None, smoothing_ignore=None):
        lr, hr = samples[0], samples[1]
        if smoothing is not None:
            lr = smooth_data(np.array(lr), self.lr_features,
                             smoothing_ignore or [], smoothing)
        if self._is_4d:
            lr, hr = lr[:, :, :, 0, :], hr[:, :, :, 0, :]
        return np.ascontiguousarray(lr), np.ascontiguousarray(hr)

    def post_proc(self, samples):
        if self._has_obs:
            lr, hr = self.transform(samples[:2], **self.transform_kwargs)
            obs = samples[2]
            if self._is_4d:
                obs = obs[:, :, :, 0, :]
            return BatchWithObs(low_res=lr, high_res=hr, obs=obs)
        lr, hr = self.transform(samples, **self.transform_kwargs)
        return Batch(low_res=lr, high_res=hr)


ConditionalBatch = namedtuple(
    'ConditionalBatch', ['low_res', 'high_res', 'output', 'mask'])


class ConditionalBatchQueue(SingleBatchQueue):
    """Queue for conditional-moment training: adds a padding-aware mask
    and a moment-specific output target (reference:
    batch_queues/conditional.py:22-170)."""

    def __init__(self, samplers, time_enhance_mode='constant',
                 lower_models=None, s_padding=0, t_padding=0,
                 end_t_padding=False, **kwargs):
        if kwargs.get('device_transform'):
            # post_proc below always emits host-built ConditionalBatch
            # (mask + moment target); accepting the flag would make it
            # a silent no-op with a stale model transform config
            raise NotImplementedError(
                'Conditional-moment queues build the mask/output '
                'target on the host; device_transform=True is not '
                'supported here')
        self.time_enhance_mode = time_enhance_mode
        self.lower_models = lower_models or {}
        self.s_padding = s_padding
        self.t_padding = t_padding
        self.end_t_padding = end_t_padding
        super().__init__(samplers, **kwargs)

    def make_mask(self, high_res):
        """1 inside the (s_padding, t_padding)-trimmed interior, else 0."""
        mask = np.zeros(high_res.shape, dtype=high_res.dtype)
        s_min = self.s_padding
        t_min = self.t_padding
        s_max = None if self.s_padding == 0 else -self.s_padding
        t_max = None if self.t_padding == 0 else -self.t_padding
        if self.end_t_padding and self.t_enhance > 1:
            t_max = (1 - self.t_enhance if t_max is None
                     else 1 - self.t_enhance - self.t_padding)
        if high_res.ndim == 4:
            mask[:, s_min:s_max, s_min:s_max, :] = 1.0
        else:
            mask[:, s_min:s_max, s_min:s_max, t_min:t_max, :] = 1.0
        return mask

    def _enhanced_lr(self, lr):
        """Simple-enhance LR back to HR shape for subfilter targets."""
        from sup3r_tpu.ops import (
            spatial_simple_enhancing,
            temporal_simple_enhancing,
        )

        out = spatial_simple_enhancing(lr, s_enhance=self.s_enhance)
        out = temporal_simple_enhancing(out, t_enhance=self.t_enhance,
                                        mode=self.time_enhance_mode)
        return out[..., self.hr_features_ind]

    def _lower_model_output(self, lr, hr):
        """First-moment model prediction on this batch (normalized)."""
        model = self.lower_models[1]
        exo = model.get_hr_exo_input(hr)
        out = np.asarray(model._get_gen_apply()(
            model.gen_params, np.asarray(lr, np.float32),
            {k: np.asarray(v, np.float32) for k, v in exo.items()}))
        return np.asarray(model._combine_loss_input(hr, out))

    def make_output(self, samples):
        """Moment target; overridden per moment type."""
        _, hr = samples
        return hr

    def post_proc(self, samples):
        lr, hr = self.transform(samples, **self.transform_kwargs)
        mask = self.make_mask(hr)
        output = self.make_output((lr, hr))
        return ConditionalBatch(low_res=lr, high_res=hr, output=output,
                                mask=mask)


class QueueMom1(ConditionalBatchQueue):
    """First moment: target = HR."""


class QueueMom1SF(ConditionalBatchQueue):
    """First moment of subfilter: target = HR - enhanced(LR)."""

    def make_output(self, samples):
        lr, hr = samples
        return hr - self._enhanced_lr(lr)


class QueueMom2(ConditionalBatchQueue):
    """Second moment: target = (HR - <HR|LR>)^2."""

    def make_output(self, samples):
        lr, hr = samples
        return (hr - self._lower_model_output(lr, hr)) ** 2


class QueueMom2Sep(QueueMom1):
    """Second moment, separate: target = HR^2."""

    def make_output(self, samples):
        return super().make_output(samples) ** 2


class QueueMom2SF(ConditionalBatchQueue):
    """Second moment of subfilter: (HR - LR_enh - <SF|LR>)^2."""

    def make_output(self, samples):
        lr, hr = samples
        out = self._lower_model_output(lr, hr)
        return (hr - self._enhanced_lr(lr) - out) ** 2


class QueueMom2SepSF(QueueMom1SF):
    """Second moment of subfilter, separate: (HR - LR_enh)^2."""

    def make_output(self, samples):
        return super().make_output(samples) ** 2


class BatchQueueDC(SingleBatchQueue):
    """Data-centric queue: samplers draw from loss-adaptive bins
    (reference: batch_queues/dc.py:13)."""

    def __init__(self, samplers, n_space_bins=1, n_time_bins=1, **kwargs):
        self.n_space_bins = n_space_bins
        self.n_time_bins = n_time_bins
        self._spatial_weights = np.ones(n_space_bins) / n_space_bins
        self._temporal_weights = np.ones(n_time_bins) / n_time_bins
        super().__init__(samplers, **kwargs)
        self.update_weights(self._spatial_weights, self._temporal_weights)

    @property
    def spatial_weights(self):
        """Current spatial bin weights."""
        return self._spatial_weights

    @property
    def temporal_weights(self):
        """Current temporal bin weights."""
        return self._temporal_weights

    def update_weights(self, spatial_weights, temporal_weights):
        """Push new bin weights into every sampler."""
        self._spatial_weights = np.asarray(spatial_weights)
        self._temporal_weights = np.asarray(temporal_weights)
        for s in self.samplers:
            s.update_weights(self._spatial_weights,
                             self._temporal_weights)


class ValBatchQueueDC(BatchQueueDC):
    """Validation queue yielding one batch per spatiotemporal bin so
    per-bin losses are measurable (reference: batch_queues/dc.py:69)."""

    def __init__(self, samplers, n_space_bins=1, n_time_bins=1, **kwargs):
        kwargs['n_batches'] = n_space_bins * n_time_bins
        # each sample_batch call mutates EVERY sampler's bin weights
        # (focus-one-bin), so two in-flight productions would both
        # draw from the later call's bin — per-bin validation losses
        # require serial production
        kwargs['max_workers'] = 1
        super().__init__(samplers, n_space_bins=n_space_bins,
                         n_time_bins=n_time_bins, **kwargs)

    def sample_batch(self):
        """Focus all weight on the bin for the current batch index."""
        i = getattr(self, '_batch_counter', 0)
        s_idx = i % self.n_space_bins
        t_idx = i // self.n_space_bins % self.n_time_bins
        s_w = np.zeros(self.n_space_bins)
        s_w[s_idx] = 1
        t_w = np.zeros(self.n_time_bins)
        t_w[t_idx] = 1
        self.update_weights(s_w, t_w)
        self._batch_counter = i + 1
        return super().sample_batch()
