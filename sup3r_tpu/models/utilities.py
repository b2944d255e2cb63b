"""Model-layer utilities: interruptible training sessions + profiling.

Reference parity: sup3r/models/utilities.py:30-133 (TrainingSession,
tensorboard profiling — here jax.profiler traces).
"""

import contextlib
import logging
import os
import threading

logger = logging.getLogger(__name__)


class TrainingSession:
    """Run model.train in a thread so Ctrl-C stops the batch handler
    gracefully and saves progress (reference: models/utilities.py:30).
    """

    def __init__(self, batch_handler, model, **kwargs):
        self.batch_handler = batch_handler
        self.model = model
        self.kwargs = kwargs
        self._exc = None

    def _target(self):
        try:
            self.model.train(self.batch_handler, **self.kwargs)
        except Exception as e:  # surfaced in run()
            self._exc = e

    def run(self):
        """Train until completion or KeyboardInterrupt."""
        thread = threading.Thread(target=self._target, daemon=True)
        thread.start()
        try:
            while thread.is_alive():
                thread.join(timeout=0.5)
        except KeyboardInterrupt:
            logger.info('Interrupt received; stopping batch handler '
                        'and saving model state')
            self.batch_handler.stop()
            thread.join(timeout=30)
        if self._exc is not None:
            raise self._exc
        return self.model


def make_tb_writer(out_dir):
    """TensorBoard SummaryWriter logging to ``<out_dir>/../logs``
    (torch's TF-free event writer; reference writes the same scalars
    via tf.summary, sup3r/models/utilities.py:77-145). Returns None
    with a warning when tensorboard isn't importable."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:  # pragma: no cover - tb is baked into this image
        logger.warning('tensorboard_log requested but tensorboard is '
                       'not importable; skipping TB logging')
        return None
    pardir = os.path.abspath(os.path.join(out_dir or '.', os.pardir))
    log_dir = os.path.join(pardir, 'logs')
    os.makedirs(log_dir, exist_ok=True)
    logger.info('TensorBoard logs -> %s', log_dir)
    return SummaryWriter(log_dir=log_dir)


def tb_log_dict(writer, entry, step):
    """Write a loss_details-style dict as TB scalars/text."""
    if writer is None:
        return
    for name, value in entry.items():
        try:
            if isinstance(value, str):
                writer.add_text(name, value, step)
            else:
                writer.add_scalar(name, float(value), step)
        except (TypeError, ValueError):
            continue
    writer.flush()


@contextlib.contextmanager
def profile_to_dir(log_dir, enabled=True):
    """jax.profiler trace context writing to ``log_dir`` (view with
    tensorboard / xprof). TPU-native replacement for the reference's
    tf.summary.trace hooks."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info('Wrote jax profiler trace to %s', log_dir)
