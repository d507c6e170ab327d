from layoutdetr_tpu.ops.bias_act import bias_act, activation_funcs  # noqa: F401
from layoutdetr_tpu.ops.upfirdn2d import (  # noqa: F401
    upfirdn2d,
    setup_filter,
    filter2d,
    upsample2d,
    downsample2d,
)
from layoutdetr_tpu.ops.conv2d_resample import conv2d_resample  # noqa: F401
