"""Output writing, caching and chunk collection."""

from sup3r_tpu.postprocessing.cachers import Cacher, load_cached  # noqa
