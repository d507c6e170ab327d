"""Faithful image-FID path: InceptionV3 converter parity + real-patch
compositing semantics (VERDICT round 1, item 3)."""

import numpy as np
import pytest

from layoutdetr_tpu.data.dataset import RGB_MEAN, RGB_STD


def _norm(u8):
    return (u8.astype(np.float32) / 255.0 - RGB_MEAN) / RGB_STD


def test_inception_converter_parity():
    torch = pytest.importorskip("torch")
    from fid_inception_torch import FIDInceptionV3

    from layoutdetr_tpu.models.inception import InceptionV3
    from layoutdetr_tpu.utils.torch_convert import convert_inception

    torch.manual_seed(0)
    ref = FIDInceptionV3().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_inception(sd)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(InceptionV3().apply({"params": params}, x))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_composite_places_patch_at_fake_position():
    from layoutdetr_tpu.metrics.compositing import composite_layout

    W_page, H_page = 100, 50
    bg = _norm(np.full((64, 64, 3), 200, np.uint8))       # light background
    patch = _norm(np.full((40, 40, 3), np.array([255, 0, 0]), np.uint8))  # red

    # Real size 20x10 px; generated position: center of the page.
    boxes_real = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    boxes_fake = np.array([[0.5, 0.5, 0.4, 0.4]], np.float32)
    img = composite_layout(boxes_fake, boxes_real, patch[None], bg,
                           W_page, H_page, size_canvas=100)
    assert img.shape == (100, 100, 3) and img.dtype == np.uint8
    # Canvas: W>H -> 100x50 content, vertically centered (pad rows black).
    assert (img[:20] == 0).all() and (img[-20:] == 0).all()
    # Center pixel inside the pasted red patch.
    cy, cx = 50, 50
    assert img[cy, cx, 0] > 200 and img[cy, cx, 1] < 60
    # Outside the fake box: background gray.
    assert abs(int(img[30, 10, 0]) - 200) <= 6


def test_composite_draws_larger_boxes_first():
    from layoutdetr_tpu.metrics.compositing import composite_layout

    bg = _norm(np.full((32, 32, 3), 128, np.uint8))
    red = _norm(np.full((64, 64, 3), np.array([255, 0, 0]), np.uint8))
    blue = _norm(np.full((64, 64, 3), np.array([0, 0, 255]), np.uint8))
    # Both centered; red is larger -> drawn first -> blue ends up on top.
    boxes_fake = np.array([[0.5, 0.5, 0.8, 0.8], [0.5, 0.5, 0.3, 0.3]], np.float32)
    boxes_real = np.array([[0.5, 0.5, 0.5, 0.5], [0.5, 0.5, 0.5, 0.5]], np.float32)
    img = composite_layout(boxes_fake, boxes_real,
                           np.stack([red, blue]), bg, 64, 64, size_canvas=64)
    assert img[32, 32, 2] > 200 and img[32, 32, 0] < 60  # blue wins center
    assert img[32, 6, 0] > 200                           # red ring survives


def test_composite_batch_and_overhang_clipping():
    from layoutdetr_tpu.metrics.compositing import composite_batch

    bg = _norm(np.full((2, 32, 32, 3), 50, np.uint8))
    patches = _norm(np.full((2, 1, 64, 64, 3), 250, np.uint8))
    # Second sample's box hangs off the left/top edge.
    fake = np.array([[[0.5, 0.5, 0.4, 0.4]], [[0.0, 0.0, 0.5, 0.5]]], np.float32)
    real = np.array([[[0.5, 0.5, 0.3, 0.3]], [[0.5, 0.5, 0.3, 0.3]]], np.float32)
    mask = np.ones((2, 1), bool)
    out = composite_batch(fake, real, patches, mask, bg,
                          W_page=[40, 40], H_page=[40, 40], size_canvas=40)
    assert out.shape == (2, 40, 40, 3)
    assert out[1, 0, 0, 0] > 200          # clipped paste reaches the corner
    assert abs(int(out[1, 30, 30, 0]) - 50) <= 6  # rest is background


def test_image_fid_uses_patch_compositing(tmp_path):
    """compute_image_fid on a patch-bearing zip runs the faithful path
    (no colored-box fallback) end to end with the labeled random-feature
    detector."""
    import dataclasses

    import jax

    from layoutdetr_tpu.config import EasyDict
    from layoutdetr_tpu.data.dataset import LayoutDataset
    from layoutdetr_tpu.data.synthetic import make_synthetic_zip
    from layoutdetr_tpu.metrics.image_fid import compute_image_fid
    from layoutdetr_tpu.models.generator import Generator, GeneratorConfig

    cfg = GeneratorConfig(
        hidden_dim=16, bert_f_dim=32, bert_num_heads=2, bert_num_encoder_layers=1,
        bert_num_decoder_layers=1, bert_intermediate_size=64, im_f_dim=16,
        max_text_length=16, vocab_size=512, bos_token_id=510, nhead=2,
        num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=32,
        background_size=32, max_elements=9,
    )
    zip_path = make_synthetic_zip(str(tmp_path / "val.zip"), num_samples=3,
                                  image_size=32, max_elements=3)
    ds = LayoutDataset(zip_path, background_size=32, max_text_length=16)
    g = Generator(cfg)
    b = ds.collate([0])
    b["text_ids"] = np.clip(b["text_ids"], 0, cfg.vocab_size - 1)
    params = g.init(
        jax.random.PRNGKey(0), z=np.zeros((1, 9, cfg.z_dim), np.float32),
        bbox_real=b["bboxes"], bbox_class=b["labels"], text_ids=b["text_ids"],
        text_mask=b["text_mask"], text_len=np.clip(b["text_len"], 0, 15),
        padding_mask=b["padding_mask"], background=b["background"],
    )

    # The patch dataset built inside compute_image_fid reuses the real
    # tokenizer, whose ids exceed the tiny test vocab -> clip inside the
    # generator wrapper.
    def g_apply(p, **kw):
        kw["text_ids"] = jax.numpy.clip(kw["text_ids"], 0, cfg.vocab_size - 1)
        kw["text_len"] = jax.numpy.clip(kw["text_len"], 0, 15)
        return g.apply(p, **kw)

    opts = EasyDict(dataset=ds, g_apply=g_apply, params=params, gcfg=cfg,
                    batch=3, size_canvas=64)
    fid = compute_image_fid(opts, max_items=3)
    assert np.isfinite(fid) and fid >= 0.0


def test_load_inception_params_from_orbax_dir(tmp_path):
    """torch_convert --kind inception saves an orbax dir; the metric
    loader must accept it (plus .npz and raw pytrees)."""
    import numpy as np

    from layoutdetr_tpu.models.inception import load_inception_params
    from layoutdetr_tpu.utils.checkpoint import save_checkpoint

    tree = {"Conv2d_1a_3x3": {"conv": np.ones((3, 3, 3, 4), np.float32)}}
    ckpt = str(tmp_path / "inc")
    save_checkpoint(ckpt, {"params": tree})
    out = load_inception_params(ckpt)
    assert np.array_equal(out["Conv2d_1a_3x3"]["conv"], tree["Conv2d_1a_3x3"]["conv"])

    np.savez(tmp_path / "inc.npz", **{"Conv2d_1a_3x3/conv": tree["Conv2d_1a_3x3"]["conv"]})
    out2 = load_inception_params(str(tmp_path / "inc.npz"))
    assert np.array_equal(out2["Conv2d_1a_3x3"]["conv"], tree["Conv2d_1a_3x3"]["conv"])

    assert load_inception_params(tree) is tree
