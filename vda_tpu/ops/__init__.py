from vda_tpu.ops.layers import (  # noqa: F401
    linear,
    layer_norm,
    group_norm,
    conv2d,
    conv_transpose_same_stride,
    gelu,
)
from vda_tpu.ops.resize import resize_bilinear, resize_bicubic  # noqa: F401
from vda_tpu.ops.attention import dot_product_attention  # noqa: F401
