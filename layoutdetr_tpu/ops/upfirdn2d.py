"""upfirdn2d: pad → zero-insert upsample → FIR filter → downsample, NHWC.

TPU-native rebuild of the reference CUDA plugin
(reference: torch_utils/ops/upfirdn2d.py:71-212 + .cu kernels).

Design notes:

- The *entire* op is expressed as one ``lax.conv_general_dilated``:
  ``lhs_dilation`` performs the zero-insertion upsample, explicit
  padding performs the pad/crop, ``feature_group_count=C`` makes the
  FIR filter depthwise, and ``window_strides`` performs the
  downsample. XLA lowers this to a single fused TPU kernel — the
  hand-written large/small-filter CUDA kernels of the reference
  (upfirdn2d.cu:30+) collapse into compiler-scheduled code.
- Separable filters run as two 1-D depthwise convs (the reference's
  separable fast path, upfirdn2d.py:203-208).
- Gradients are native JAX autodiff of the convolution, which is
  mathematically the transposed upfirdn the reference hand-derived
  (upfirdn2d.py:252-270).
- Layout is NHWC (TPU-native), not the reference's NCHW.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax


def _parse_scaling(scaling):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


def setup_filter(f, normalize=True, flip_filter=False, gain=1, separable=None):
    """Prepare a FIR filter (reference: upfirdn2d.py:71-115). Returns float32 ndarray."""
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2) and f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = np.flip(f).copy()
    f = f * (gain ** (f.ndim / 2))
    return f


def _depthwise_conv(x, f2d, up, padding, down):
    """One fused depthwise conv: x [N,H,W,C], f2d [fh,fw].

    Always full precision: FIR filtering is a tiny fraction of model
    FLOPs, and reduced-precision resampling injects ~1e-3 noise into
    every StyleGAN2 activation (JAX's default conv precision rounds
    operands to bf16 on MXU-class backends).
    """
    c = x.shape[-1]
    fh, fw = f2d.shape
    # HWIO with feature_group_count=C: [fh, fw, 1, C]
    kernel = jnp.broadcast_to(f2d.astype(x.dtype)[:, :, None, None], (fh, fw, 1, c))
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(down[1], down[0]),  # (y, x)
        padding=((padding[2], padding[3]), (padding[0], padding[1])),  # (y, x)
        lhs_dilation=(up[1], up[0]),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1, impl="xla"):
    """Pad, upsample, FIR-filter, and downsample a batch of NHWC images.

    Semantics match reference upfirdn2d.py:119-212 (with NHWC layout).

    Args:
      x: [N, H, W, C].
      f: float filter, [fh, fw] non-separable, [taps] separable, or None.
      up/down: int or (x, y).
      padding: int, (x, y), or (x0, x1, y0, y1) w.r.t. the upsampled image.
      flip_filter: False = convolution, True = correlation.
      gain: overall magnitude scaling.
    """
    del impl  # single XLA-fused path; kept for API parity with the reference
    assert x.ndim == 4
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)

    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = jnp.flip(f)

    # Negative padding = cropping. conv_general_dilated supports negative
    # pads directly, but combined with lhs_dilation the semantics of
    # negative padding differ from pad-then-crop for the trailing partial
    # zeros; handle cropping explicitly for exact parity.
    neg = min(px0, px1, py0, py1) < 0
    if neg:
        # Materialize the upsampled+padded tensor, then filter.
        n, h, w, c = x.shape
        xz = jnp.zeros((n, h * upy, w * upx, c), x.dtype)
        xz = xz.at[:, ::upy, ::upx, :].set(x)
        xz = jnp.pad(xz, ((0, 0), (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0)), (0, 0)))
        xz = xz[:, max(-py0, 0): xz.shape[1] - max(-py1, 0), max(-px0, 0): xz.shape[2] - max(-px1, 0), :]
        x, upx, upy = xz, 1, 1
        px0 = px1 = py0 = py1 = 0

    # lhs_dilation yields (h-1)*up+1 samples (no trailing zeros), while the
    # reference's zero-stuffing yields h*up; append up-1 zeros via padding so
    # output sizes match exactly (the zeros contribute nothing to the conv).
    ex1 = px1 + (upx - 1)
    ey1 = py1 + (upy - 1)
    if f.ndim == 1:
        fx = f[None, :]
        fy = f[:, None]
        x = _depthwise_conv(x, fx, (upx, 1), (px0, ex1, 0, 0), (1, 1))
        x = _depthwise_conv(x, fy, (1, upy), (0, 0, py0, ey1), (1, 1))
        # Downsample last (cheap slice; conv strides can't be split across the two passes
        # without changing which taps fall on kept pixels).
        return x[:, ::downy, ::downx, :]
    x = _depthwise_conv(x, f, (upx, upy), (px0, ex1, py0, ey1), (downx, downy))
    return x


def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    """Filter with zero-phase padding (reference: upfirdn2d.py:278-311)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = (f.shape[-1], f.shape[0]) if hasattr(f, "shape") else (1, 1)
    px0 += fw // 2
    px1 += (fw - 1) // 2
    py0 += fh // 2
    py1 += (fh - 1) // 2
    return upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    """Upsample with the given filter (reference: upfirdn2d.py:314-350)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw = int(f.shape[-1]) if f is not None else 1
    fh = int(f.shape[0]) if f is not None else 1
    px0 += (fw + upx - 1) // 2
    px1 += (fw - upx) // 2
    py0 += (fh + upy - 1) // 2
    py1 += (fh - upy) // 2
    return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1], flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    """Downsample with the given filter (reference: upfirdn2d.py:353-389)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw = int(f.shape[-1]) if f is not None else 1
    fh = int(f.shape[0]) if f is not None else 1
    px0 += (fw - downx + 1) // 2
    px1 += (fw - downx) // 2
    py0 += (fh - downy + 1) // 2
    py1 += (fh - downy) // 2
    return upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1], flip_filter=flip_filter, gain=gain)
