"""Output QA: re-coarsening error analysis + distribution/spectrum
metrics."""

from sup3r_tpu.qa.qa import Sup3rQa  # noqa: F401
