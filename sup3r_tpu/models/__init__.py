"""Model zoo: GANs, conditional-moment models, multi-step chains and
physics baselines."""

from sup3r_tpu.models.conditional import Sup3rCondMom  # noqa: F401
from sup3r_tpu.models.dc import Sup3rGanDC  # noqa: F401
from sup3r_tpu.models.gan import Sup3rGan  # noqa: F401
from sup3r_tpu.models.linear import LinearInterp  # noqa: F401
from sup3r_tpu.models.multi_step import (  # noqa: F401
    MultiStepGan,
    MultiStepSurfaceMetGan,
    SolarMultiStepGan,
)
from sup3r_tpu.models.network import Network  # noqa: F401
from sup3r_tpu.models.solar_cc import SolarCC  # noqa: F401
from sup3r_tpu.models.surface import SurfaceSpatialMetModel  # noqa: F401
from sup3r_tpu.models.with_obs import Sup3rGanWithObs  # noqa: F401

SPATIAL_FIRST_MODELS = (MultiStepSurfaceMetGan, SolarMultiStepGan)
