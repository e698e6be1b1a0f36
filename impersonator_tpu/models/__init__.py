"""Neural networks (flax.linen, NHWC).

Factory mirrors the reference's NetworksFactory (networks/networks.py:10-42).
"""

from impersonator_tpu.models.generator import (  # noqa: F401
    ImpersonatorGenerator,
    ResUnetGenerator,
    ResNetGenerator,
)
from impersonator_tpu.models.discriminator import (  # noqa: F401
    PatchDiscriminator,
    GlobalLocalDiscriminator,
    MultiScaleDiscriminator,
)
from impersonator_tpu.models.inpaintor import InpaintSANet  # noqa: F401
from impersonator_tpu.models.hmr import HumanModelRecovery  # noqa: F401


def get_by_name(network_name: str, **kwargs):
    """Network registry (reference networks/networks.py:10-42)."""
    if network_name == "impersonator":
        return ImpersonatorGenerator(**kwargs)
    if network_name == "deepfillv2":
        return InpaintSANet(**kwargs)
    if network_name == "discriminator_patch_gan":
        return PatchDiscriminator(**kwargs)
    if network_name == "global_local":
        return GlobalLocalDiscriminator(**kwargs)
    if network_name == "multi_scale":
        return MultiScaleDiscriminator(**kwargs)
    if network_name == "hmr":
        return HumanModelRecovery(**kwargs)
    raise ValueError(f"Network {network_name} not recognized.")
