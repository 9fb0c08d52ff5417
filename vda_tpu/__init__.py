"""vda_tpu — a TPU-native (JAX/XLA/Pallas) video depth estimation framework.

A ground-up rebuild of the capabilities of the reference Video-Depth-Anything
pipeline (see /root/reference) designed TPU-first:

  * pure-functional models (params as pytrees, jitted apply functions)
  * NHWC layouts, bf16 compute with fp32 islands
  * matmul-based (MXU-friendly) image resizing with exact torch/cv2 semantics
  * Pallas fused attention kernels for the two hot attention shapes
  * static-shape streaming cache (ring buffer) for causal inference
  * jax.sharding Mesh-based scale-out (data-parallel windows, tensor-parallel
    attention/MLP) instead of any host-side multiprocessing

Reference parity map (file:line citations) lives in each submodule docstring.
"""

__version__ = "0.1.0"

from vda_tpu.config import MODEL_CONFIGS, ModelConfig, get_config  # noqa: F401
