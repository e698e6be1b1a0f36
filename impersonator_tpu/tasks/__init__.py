"""Task orchestration: imitator / swapper / viewer / adversarial trainer."""

from impersonator_tpu.tasks.renderer import SMPLRenderer  # noqa: F401
from impersonator_tpu.tasks.imitator import Imitator  # noqa: F401
from impersonator_tpu.tasks.swapper import Swapper  # noqa: F401
from impersonator_tpu.tasks.viewer import Viewer  # noqa: F401
