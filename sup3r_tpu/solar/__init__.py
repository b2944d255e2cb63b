"""Solar irradiance post-processing (Sup3rCC)."""

from sup3r_tpu.solar.disc import calc_dhi, dark_night, disc  # noqa
from sup3r_tpu.solar.solar import Solar  # noqa: F401
