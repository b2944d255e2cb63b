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


def load_reference_gan(model_dir, **kwargs):
    """Import a reference (NREL sup3r / phygnn TF) model checkpoint
    directory into a ``Sup3rGan`` (lazy import; see utilities/port.py)."""
    from sup3r_tpu.utilities.port import load_reference_gan as _load

    return _load(model_dir, **kwargs)
