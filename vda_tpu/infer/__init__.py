from vda_tpu.infer.windowed import infer_video_depth  # noqa: F401
from vda_tpu.infer.streaming import StreamingDepth  # noqa: F401
