"""Device-side geometry and image ops (pure JAX / Pallas)."""

from impersonator_tpu.ops.smpl import (  # noqa: F401
    batch_rodrigues,
    batch_orth_proj_idrot,
    smpl_forward,
    SMPLParams,
)
from impersonator_tpu.ops.projection import (  # noqa: F401
    orthographic_proj_withz_idrot,
    look_at,
    euler_to_matrix,
    DEFAULT_EYE_Z,
)
from impersonator_tpu.ops.rasterizer import (  # noqa: F401
    rasterize_fim_wim,
    project_to_raster_space,
)
from impersonator_tpu.ops.flow import (  # noqa: F401
    correspondence_flow,
    visible_f2pts,
    null_visible_f2pts,
    encode_fim,
)
from impersonator_tpu.ops.sampler import (  # noqa: F401
    grid_sample,
    resize_bilinear_align,
    resize_flow,
)
from impersonator_tpu.ops.morphology import morph  # noqa: F401
from impersonator_tpu.ops.colorspace import (  # noqa: F401
    rgb_to_i420,
    i420_to_rgb,
)
