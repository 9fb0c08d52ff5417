from vda_tpu.models.vda import (  # noqa: F401
    init_video_depth_anything,
    forward,
    forward_features,
    forward_depth,
)
