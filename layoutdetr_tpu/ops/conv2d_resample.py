"""2D convolution with fused up/downsampling, NHWC.

TPU-native rebuild of reference torch_utils/ops/conv2d_resample.py:47-142.

The reference carries five hand-picked execution orderings because eager
PyTorch pays for every materialized intermediate. Under XLA there are
only two decisions that matter: (1) keep the main conv a single large
MXU op, (2) fold the FIR resampling into depthwise convs (see
``upfirdn2d``). So this implementation uses the reference's *generic*
composition (upsample-FIR → conv → downsample-FIR) with the same
padding arithmetic, plus the 1×1 reorderings that reduce FLOPs
regardless of backend. ``conv2d_gradfix`` has no equivalent: JAX
autodiff already provides arbitrary-order conv gradients.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from layoutdetr_tpu.ops.upfirdn2d import _parse_padding, upfirdn2d as _upfirdn2d


def _conv2d(x, w, stride=1, padding=0, groups=1, flip_weight=True):
    """x: [N,H,W,Ci], w: [kh,kw,Ci/groups,Co]. flip_weight=True = correlation.

    Precision policy: fp32 operands run at full precision (dtype is the
    intended performance knob — bf16 activations use the MXU fast path;
    fp32 must not silently round to bf16).
    """
    if not flip_weight and (w.shape[0] > 1 or w.shape[1] > 1):
        w = jnp.flip(w, axis=(0, 1))
    if isinstance(padding, int):
        padding = [padding, padding]
    py, px = padding
    precision = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((py, py), (px, px)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1, flip_weight=True, flip_filter=False):
    """Conv2d with optional up/downsampling (padding applied once, up-space).

    Args:
      x: [N, H, W, Ci].
      w: [kh, kw, Ci//groups, Co] (HWIO).
      f: FIR filter from ``setup_filter`` or None.
      padding: int, (x, y), or (x0, x1, y0, y1) w.r.t. the upsampled image.
    """
    assert x.ndim == 4 and w.ndim == 4
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw = int(f.shape[-1]) if f is not None else 1
    fh = int(f.shape[0]) if f is not None else 1
    px0, px1, py0, py1 = _parse_padding(padding)

    # Padding arithmetic mirrors conv2d_resample.py:82-92.
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # 1x1 kernel + down only: downsample first (fewer conv FLOPs).
    if kw == 1 and kh == 1 and down > 1 and up == 1:
        x = _upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv2d(x, w, groups=groups, flip_weight=flip_weight)

    # 1x1 kernel + up only: convolve first.
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        return _upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1], gain=up ** 2, flip_filter=flip_filter)

    # Down only: FIR pad/filter, then strided conv.
    if down > 1 and up == 1:
        x = _upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # No resampling + symmetric non-negative padding: plain conv.
    if up == 1 and down == 1 and px0 == px1 and py0 == py1 and px0 >= 0 and py0 >= 0:
        return _conv2d(x, w, padding=[py0, px0], groups=groups, flip_weight=flip_weight)

    # Generic composition (reference conv2d_resample.py:137-142).
    x = _upfirdn2d(
        x, f if up > 1 else None, up=up, padding=[px0, px1, py0, py1],
        gain=up ** 2, flip_filter=flip_filter,
    )
    x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = _upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
