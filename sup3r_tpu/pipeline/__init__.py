"""Chunked inference pipeline: slicing, planning, execution."""

from sup3r_tpu.pipeline.slicer import ForwardPassSlicer  # noqa: F401
from sup3r_tpu.pipeline.strategy import (  # noqa: F401
    ForwardPassChunk,
    ForwardPassStrategy,
)
from sup3r_tpu.pipeline.forward_pass import ForwardPass  # noqa: F401
