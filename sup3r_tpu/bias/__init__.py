"""Bias calculation (linear/QDM/PresRat) and runtime bias transforms."""

from sup3r_tpu.bias.bias_calc import (  # noqa: F401
    LinearCorrection,
    MonthlyLinearCorrection,
    MonthlyScalarCorrection,
    ScalarCorrection,
    SkillAssessment,
)
from sup3r_tpu.bias.qdm import QuantileDeltaMappingCorrection  # noqa
from sup3r_tpu.bias.presrat import PresRat  # noqa: F401
from sup3r_tpu.bias.transforms import (  # noqa: F401
    global_linear_bc,
    local_linear_bc,
    local_presrat_bc,
    local_qdm_bc,
    monthly_local_linear_bc,
)
from sup3r_tpu.bias.bias_calc_vortex import (  # noqa: F401
    BiasCorrectUpdate,
    VortexMeanPrepper,
)
from sup3r_tpu.bias.utilities import lin_bc, qdm_bc  # noqa: F401
