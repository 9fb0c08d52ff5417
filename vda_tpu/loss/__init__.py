from vda_tpu.loss.loss import video_depth_loss  # noqa: F401
