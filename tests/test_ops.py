"""Parity tests: ops layer vs reference torch implementations (impl='ref')."""

import numpy as np
import pytest

import jax.numpy as jnp

from layoutdetr_tpu.ops import bias_act, conv2d_resample, setup_filter, upfirdn2d

from conftest import import_reference_module

ref_bias_act = import_reference_module("torch_utils.ops.bias_act")
ref_upfirdn2d = import_reference_module("torch_utils.ops.upfirdn2d")
needs_ref = pytest.mark.skipif(ref_bias_act is None, reason="reference/torch unavailable")


@needs_ref
@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid", "elu", "selu", "softplus", "swish"])
def test_bias_act_parity(act):
    import torch

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 7, 16)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    ours = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), dim=-1, act=act, clamp=0.7))
    theirs = ref_bias_act._bias_act_ref(
        torch.from_numpy(x), torch.from_numpy(b), dim=2, act=act, clamp=0.7
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@needs_ref
def test_bias_act_pallas_interpret():
    """Pallas kernel (generic interpreter on CPU) matches the XLA path."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 9, 37)).astype(np.float32)
    b = rng.normal(size=(37,)).astype(np.float32)
    want = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act="lrelu", gain=1.3, clamp=0.9))
    got = np.asarray(
        bias_act(jnp.asarray(x), jnp.asarray(b), act="lrelu", gain=1.3, clamp=0.9,
                 impl="pallas_interpret")
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _ref_upfirdn(x_nhwc, f, **kw):
    import torch

    x_nchw = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    ft = torch.from_numpy(np.ascontiguousarray(f)) if f is not None else None
    out = ref_upfirdn2d._upfirdn2d_ref(x_nchw, ft, **kw).numpy()
    return out.transpose(0, 2, 3, 1)


@needs_ref
@pytest.mark.parametrize(
    "up,down,padding,sep",
    [
        (1, 1, 0, False),
        (2, 1, [2, 1, 2, 1], False),
        (1, 2, [1, 1, 1, 1], False),
        (2, 2, 2, False),
        (2, 1, [2, 1, 2, 1], True),
        (1, 2, [1, 2, 1, 2], True),
        (1, 1, [-1, 1, 2, -1], False),  # negative padding = crop
        (2, 1, [-1, 2, 1, -2], False),
    ],
)
def test_upfirdn2d_parity(up, down, padding, sep):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    if sep:
        f = setup_filter([1, 3, 3, 1] * 2, separable=True)  # 8 taps -> separable
    else:
        f = setup_filter([1, 3, 3, 1])
    ours = np.asarray(upfirdn2d(jnp.asarray(x), f, up=up, down=down, padding=padding, gain=1.5))
    theirs = _ref_upfirdn(x, f, up=up, down=down, padding=padding, gain=1.5)
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@needs_ref
@pytest.mark.parametrize("up,down,kernel", [(1, 1, 3), (2, 1, 3), (1, 2, 3), (1, 1, 1), (2, 1, 1), (1, 2, 1)])
def test_conv2d_resample_parity(up, down, kernel):
    ref_cr = import_reference_module("torch_utils.ops.conv2d_resample")
    import torch

    rng = np.random.default_rng(3)
    ci, co = 4, 5
    x = rng.normal(size=(2, 8, 8, ci)).astype(np.float32)
    w_oihw = rng.normal(size=(co, ci, kernel, kernel)).astype(np.float32) * 0.3
    f = setup_filter([1, 3, 3, 1])
    pad = kernel // 2

    ours = np.asarray(
        conv2d_resample(
            jnp.asarray(x),
            jnp.asarray(w_oihw.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            f=f, up=up, down=down, padding=pad, flip_weight=(up == 1),
        )
    )
    theirs = (
        ref_cr.conv2d_resample(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
            torch.from_numpy(w_oihw),
            f=torch.from_numpy(f), up=up, down=down, padding=pad, flip_weight=(up == 1),
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
