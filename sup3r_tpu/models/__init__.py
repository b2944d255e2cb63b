"""Model zoo: GANs, conditional-moment models, multi-step chains and
physics baselines."""

from sup3r_tpu.models.gan import Sup3rGan  # noqa: F401
from sup3r_tpu.models.network import Network  # noqa: F401
