"""Numeric parity: StyleGAN2 Decoder/ops vs the reference torch implementation.

SURVEY.md §7 hard part 2: the modulated-conv + resample-filter
arithmetic has subtle gain/padding conventions. These tests convert a
random-initialized reference ``Decoder`` (the discriminator's
background reconstructor, networks_detr.py:261 config) and require the
generated image to match.
"""

import numpy as np
import pytest

from conftest import import_reference_module

torch = pytest.importorskip("torch")

ref_sg2 = import_reference_module("training.networks_stylegan2")
needs_ref = pytest.mark.skipif(ref_sg2 is None, reason="reference unavailable")


@needs_ref
def test_decoder_parity():
    from layoutdetr_tpu.models.stylegan2 import Decoder
    from layoutdetr_tpu.utils.torch_convert import convert_stylegan2_decoder

    torch.manual_seed(0)
    # Small version of the bg_decoder config (networks_detr.py:261).
    ref = ref_sg2.Decoder(
        z_dim=8, w_dim=16, channel_max=16, channel_base=256, img_channels=3,
        img_resolution=16, use_noise=False, num_fp16_res=0, conv_clamp=None,
        fused_modconv_default=False,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_stylegan2_decoder(sd)

    model = Decoder(z_dim=8, w_dim=16, img_resolution=16, img_channels=3,
                    use_noise=False, channel_base=256, channel_max=16, conv_clamp=None)

    z = np.random.default_rng(0).normal(size=(2, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply({"params": params}, z, noise_mode="none"))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@needs_ref
def test_fully_connected_layer_parity():
    from layoutdetr_tpu.models.stylegan2 import FullyConnectedLayer

    torch.manual_seed(1)
    ref = ref_sg2.FullyConnectedLayer(12, 7, activation="lrelu", lr_multiplier=0.01,
                                      bias_init=1.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"weight": sd["weight"].T.copy(), "bias": sd["bias"].copy()}

    model = FullyConnectedLayer(7, activation="lrelu", lr_multiplier=0.01, bias_init=1.0)
    x = np.random.default_rng(1).normal(size=(3, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply({"params": params}, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@needs_ref
def test_conv2d_layer_updown_parity():
    from layoutdetr_tpu.models.stylegan2 import Conv2dLayer

    for up, down in [(1, 1), (2, 1), (1, 2)]:
        torch.manual_seed(2)
        ref = ref_sg2.Conv2dLayer(4, 6, kernel_size=3, activation="lrelu",
                                  up=up, down=down).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = {"weight": np.transpose(sd["weight"], (2, 3, 1, 0)).copy(),
                  "bias": sd["bias"].copy()}
        model = Conv2dLayer(6, 3, activation="lrelu", up=up, down=down)
        x = np.random.default_rng(2).normal(size=(2, 8, 8, 4)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
                       ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(model.apply({"params": params}, x))
        assert got.shape == want.shape, (up, down)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4, err_msg=f"up={up} down={down}")