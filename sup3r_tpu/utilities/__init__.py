"""Cross-cutting utilities: timing, rng, physical output attributes."""

from sup3r_tpu.utilities.utilities import (  # noqa: F401
    OUTPUT_ATTRS,
    RANDOM_GENERATOR,
    Timer,
    enforce_limits,
    generate_random_string,
    get_dset_attrs,
    nn_fill_array,
    safe_serialize,
)
