"""Data plane: eager host-side containers, samplers and batch queues
feeding device arrays.

Unlike the reference's lazy xarray/dask stack, everything here is
explicit: loaders produce standardized in-memory ``GridDataset`` arrays
(or memory-mapped views), samplers crop them, and a host prefetch
thread keeps a device-bound batch queue full while the train step runs.
"""

from sup3r_tpu.preprocessing.grid import GridDataset, PairedDataset  # noqa
from sup3r_tpu.preprocessing.lazy import LazyGridDataset  # noqa: F401
from sup3r_tpu.preprocessing.data_handlers import (  # noqa: F401
    DailyDataHandler,
    DataHandler,
    DataHandlerH5SolarCC,
    DataHandlerH5WindCC,
    DataHandlerNCforCC,
    DataHandlerNCforCCwithPowerLaw,
    get_input_handler_class,
)
from sup3r_tpu.preprocessing.samplers import (  # noqa: F401
    DualSampler,
    Sampler,
)
from sup3r_tpu.preprocessing.batch_queues import (  # noqa: F401
    Batch,
    DualBatchQueue,
    SingleBatchQueue,
)
from sup3r_tpu.preprocessing.batch_handlers import (  # noqa: F401
    BatchHandler,
    DualBatchHandler,
)
