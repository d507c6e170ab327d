"""Production-dims composite G/D numeric parity vs the reference torch modules.

`test_full_parity.py` proves the composite converter chain at toy widths
(BERT_F=32, T=16) — enough to catch naming/transpose bugs, but not
scale-dependent numeric drift (768-wide softmax ranges, LayerNorm eps
interaction, accumulated error through ~50 matmul layers). This driver
runs the SAME parity protocol at the reference's production training
config (reference train.py:176-181 CLI defaults -> networks_detr.py:66-71):

    bert_f_dim=768, 12 encoder / 2 decoder BERT layers, 4 heads,
    intermediate 3072, T=max_text_length=256, vocab 30524 (bert-base
    30522 + [DEC]/[ENC]), hidden_dim=256, DETR 6+6/nhead 8/ffn 2048,
    im_f_dim=512, background 256, B=1, fp32.

(background_size is 256 rather than the banner-resolution 1024: the
backbone/decoder numerics it stresses are identical and the torch-CPU
forward stays tractable on this 1-core host.)

Run standalone (subprocess-isolated like the other heavy drivers):

    python tests/_full_dims_driver.py generator
    python tests/_full_dims_driver.py discriminator

Prints per-output max-abs/rel deltas and asserts max-abs <= 1e-3
(VERDICT r2 item 1). Recorded results live in docs/PARITY.md.
"""

import sys

import numpy as np

import conftest  # noqa: F401  (forces JAX to CPU, offline guards, sys.path)
from conftest import import_reference_module

import jax

import torch

import tv_stub

tv_stub.install()

nd = import_reference_module("training.networks_detr")
med = import_reference_module("training.med")
assert nd is not None and med is not None, "reference modules unavailable"

# Reference production training config (train.py CLI defaults).
B, N, T = 1, 9, 256
VOCAB, BOS, PAD = 30524, 30522, 0
HID, BERT_F, IM_F, BG = 256, 768, 512, 256
HEADS, ENC_L, DEC_L, INTER = 4, 12, 2, 3072

TEXTS = [[
    "final summer clearance sale — everything must go, up to 70% off",
    "Shop now",
    "the quick brown fox jumps over the lazy dog " * 4,
    "LayoutDETR: detection transformer for controllable layout generation "
    "conditioned on background images and multimodal element inputs",
    "x",
    "free shipping on orders over $50 | new members save an extra 15% today",
    "", "", "",
]]


class _FakeBatch:
    def __init__(self, input_ids, attention_mask):
        self.input_ids = input_ids
        self.attention_mask = attention_mask

    def to(self, device):
        return self


class _FakeTokenizer:
    bos_token_id = BOS
    pad_token_id = PAD

    def __init__(self, ids, mask):
        self._ids = torch.from_numpy(ids)
        self._mask = torch.from_numpy(mask)

    def __len__(self):
        return VOCAB

    def __call__(self, texts, **kw):
        assert len(texts) == self._ids.shape[0]
        return _FakeBatch(self._ids.clone(), self._mask.clone())


def _fixed_tokens():
    """Token lengths spanning the full range incl. max-length sequences —
    the 256-token softmax/masking regime is exactly what toy dims miss."""
    rng = np.random.default_rng(7)
    lengths = [64, 4, 256, 192, 3, 33, 2, 2, 2][: B * N]
    ids = np.zeros((B * N, T), np.int64)
    mask = np.zeros((B * N, T), np.int64)
    for i, L in enumerate(lengths):
        ids[i, 0] = 101  # [CLS]
        ids[i, 1:L] = rng.integers(1000, 29000, size=L - 1)
        mask[i, :L] = 1
    return ids, mask


def _med_config(tmp_dir):
    import json
    import os

    cfg = {
        "architectures": ["BertModel"],
        "attention_probs_dropout_prob": 0.1,
        "hidden_act": "gelu",
        "hidden_dropout_prob": 0.1,
        "hidden_size": BERT_F,
        "initializer_range": 0.02,
        "intermediate_size": INTER,
        "layer_norm_eps": 1e-12,
        "max_position_embeddings": 512,
        "model_type": "bert",
        "num_attention_heads": HEADS,
        "num_hidden_layers": ENC_L,
        "pad_token_id": PAD,
        "type_vocab_size": 2,
        "vocab_size": VOCAB - 2,  # resize_token_embeddings grows it to VOCAB
        "encoder_width": BERT_F,
        "add_cross_attention": True,
    }
    p = os.path.join(tmp_dir, "med_config_full.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    return p


def _patch_offline(fake_tok):
    torch.hub.load_state_dict_from_url = lambda *a, **k: {}
    med.BertModel.from_pretrained = classmethod(
        lambda cls, name, config=None, add_pooling_layer=True, **kw:
        cls(config, add_pooling_layer=add_pooling_layer))
    med.BertLMHeadModel.from_pretrained = classmethod(
        lambda cls, name, config=None, **kw: cls(config))
    nd.init_tokenizer = lambda: fake_tok


def _inputs():
    rng = np.random.default_rng(3)
    z = rng.normal(size=(B, N, 4)).astype(np.float32)
    labels = rng.integers(0, 8, size=(B, N))
    bbox = rng.uniform(0.1, 0.9, size=(B, N, 4)).astype(np.float32)
    padding_mask = np.zeros((B, N), bool)
    padding_mask[0, 6:] = True
    background = rng.normal(size=(B, 3, BG, BG)).astype(np.float32)
    text_len = np.array([[min(len(s), T - 1) for s in row] for row in TEXTS],
                        np.int64)
    return z, labels, bbox, padding_mask, background, text_len


def _flax_cfg():
    from layoutdetr_tpu.models.generator import GeneratorConfig

    return GeneratorConfig(
        z_dim=4, num_bbox_labels=8, max_elements=N, hidden_dim=HID,
        bert_f_dim=BERT_F, bert_num_heads=HEADS, bert_num_encoder_layers=ENC_L,
        bert_num_decoder_layers=DEC_L, bert_intermediate_size=INTER,
        bert_max_position_embeddings=512,
        im_f_dim=IM_F, max_text_length=T, vocab_size=VOCAB,
        bos_token_id=BOS, pad_token_id=PAD,
        nhead=8, num_encoder_layers=6, num_decoder_layers=6,
        dim_feedforward=2048, background_size=BG,
    )


def _report(name, got, want, atol=1e-3):
    # squeeze both sides: the reference keeps a singleton dim on some
    # outputs (the toy test squeezes too), and B=1 adds another.
    got = np.squeeze(np.asarray(got, np.float64))
    want = np.squeeze(np.asarray(want, np.float64))
    assert got.shape == want.shape, f"{name}: {got.shape} vs {want.shape}"
    d = np.abs(got - want)
    denom = np.maximum(np.abs(want), 1e-6)
    print(f"  {name:<22} max_abs={d.max():.3e}  "
          f"max_rel={(d / denom).max():.3e}  scale={np.abs(want).max():.2e}",
          flush=True)
    assert d.max() <= atol, f"{name}: max-abs {d.max():.3e} > {atol}"


def run_generator(tmp_dir):
    from layoutdetr_tpu.models.generator import Generator
    from layoutdetr_tpu.utils.torch_convert import convert_generator

    ids, tmask = _fixed_tokens()
    _patch_offline(_FakeTokenizer(ids, tmask))
    torch.manual_seed(0)
    print("[gen] building reference torch Generator (768-wide)...", flush=True)
    ref = nd.Generator(
        z_dim=4, num_bbox_labels=8, img_channels=3, img_height=BG, img_width=BG,
        c_dim=0, hidden_dim=HID, med_config=_med_config(tmp_dir),
        bert_f_dim=BERT_F, bert_num_encoder_layers=ENC_L,
        bert_num_decoder_layers=DEC_L, bert_num_heads=HEADS,
        background_size=BG, im_f_dim=IM_F, max_text_length=T,
    ).eval()

    z, labels, bbox, padding_mask, background, text_len = _inputs()
    bbox_patch = torch.zeros(B, N, 3, 2, 2)  # only .size() is consumed
    print("[gen] torch forward...", flush=True)
    with torch.no_grad():
        got_t = ref(
            torch.from_numpy(z), torch.from_numpy(labels), torch.from_numpy(bbox),
            TEXTS, bbox_patch, torch.from_numpy(padding_mask),
            torch.from_numpy(background), None, reconst=True,
        )
    bbox_fake_t, loss_z_t, logit_cls_t, loss_lm_t, loss_text_len_t = [
        x.detach().numpy() for x in got_t
    ]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    del ref
    params = convert_generator(sd, bert_encoder_layers=ENC_L,
                               bert_decoder_layers=DEC_L, vocab_size=VOCAB)
    del sd

    print("[gen] flax forward...", flush=True)
    g = Generator(_flax_cfg())
    out = g.apply(
        {"params": params},
        z=z, bbox_class=labels, bbox_real=bbox,
        text_ids=ids.reshape(B, N, T), text_mask=tmask.reshape(B, N, T),
        text_len=text_len, padding_mask=padding_mask,
        background=np.transpose(background, (0, 2, 3, 1)), reconst=True,
    )
    bbox_fake, loss_z, logit_cls, loss_lm, loss_text_len = jax.tree.map(
        np.asarray, out)

    valid = ~padding_mask
    print("[gen] deltas (flax vs torch, fp32, production dims):", flush=True)
    _report("bbox_fake", bbox_fake, bbox_fake_t)
    _report("logit_cls[valid]", logit_cls[valid], logit_cls_t)
    _report("loss_z", float(loss_z), float(loss_z_t))
    _report("loss_lm", float(loss_lm), float(loss_lm_t))
    _report("loss_text_len", float(loss_text_len), float(loss_text_len_t))
    print("GENERATOR_FULL_DIMS_PARITY OK", flush=True)


def run_discriminator(tmp_dir):
    from layoutdetr_tpu.models.discriminator import Discriminator
    from layoutdetr_tpu.utils.torch_convert import convert_discriminator

    ids, tmask = _fixed_tokens()
    _patch_offline(_FakeTokenizer(ids, tmask))
    torch.manual_seed(1)
    print("[dis] building reference torch Discriminator (768-wide)...", flush=True)
    ref = nd.Discriminator(
        num_bbox_labels=8, img_channels=3, img_height=BG, img_width=BG,
        c_dim=0, hidden_dim=HID, med_config=_med_config(tmp_dir),
        bert_f_dim=BERT_F, bert_num_encoder_layers=ENC_L,
        bert_num_decoder_layers=DEC_L, bert_num_heads=HEADS,
        background_size=BG, im_f_dim=IM_F, max_text_length=T,
    ).eval()

    _, labels, bbox, padding_mask, background, text_len = _inputs()
    bbox_patch = torch.zeros(B, N, 3, 2, 2)
    print("[dis] torch forward...", flush=True)
    with torch.no_grad():
        got_t = ref(
            torch.from_numpy(bbox), torch.from_numpy(labels), TEXTS, bbox_patch,
            torch.from_numpy(padding_mask), torch.from_numpy(background),
            None, reconst=True,
        )
    (logit_t, logit_u_t, bbox_pred_t, logit_cls_t, loss_lm_t, loss_tl_t,
     bg_rec_t, bbox_pred_u_t, logit_cls_u_t) = [x.detach().numpy() for x in got_t]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    del ref
    params = convert_discriminator(sd, bert_encoder_layers=ENC_L,
                                   bert_decoder_layers=DEC_L, vocab_size=VOCAB)
    del sd

    print("[dis] flax forward...", flush=True)
    d = Discriminator(_flax_cfg())
    out = d.apply(
        {"params": params},
        bbox=bbox, bbox_class=labels,
        text_ids=ids.reshape(B, N, T), text_mask=tmask.reshape(B, N, T),
        text_len=text_len, padding_mask=padding_mask,
        background=np.transpose(background, (0, 2, 3, 1)), reconst=True,
    )
    (logit, logit_u, bbox_pred, logit_cls, loss_lm, loss_tl,
     bg_rec, bbox_pred_u, logit_cls_u) = jax.tree.map(np.asarray, out)

    valid = ~padding_mask
    print("[dis] deltas (flax vs torch, fp32, production dims):", flush=True)
    _report("logit", logit, logit_t)
    _report("logit_uncond", logit_u, logit_u_t)
    _report("bbox_rec[valid]", bbox_pred[valid], bbox_pred_t)
    _report("logit_cls[valid]", logit_cls[valid], logit_cls_t)
    _report("bbox_rec_u[valid]", bbox_pred_u[valid], bbox_pred_u_t)
    _report("logit_cls_u[valid]", logit_cls_u[valid], logit_cls_u_t)
    _report("loss_lm", float(loss_lm), float(loss_lm_t))
    _report("loss_text_len", float(loss_tl), float(loss_tl_t))
    # bg reconstruction runs through the 256-res StyleGAN2 decoder; keep
    # the same (slightly looser) tolerance the toy-dims test uses.
    _report("bg_rec", bg_rec, np.transpose(bg_rec_t, (0, 2, 3, 1)), atol=2e-3)
    print("DISCRIMINATOR_FULL_DIMS_PARITY OK", flush=True)


def main():
    import tempfile

    which = sys.argv[1] if len(sys.argv) > 1 else "generator"
    torch.set_num_threads(1)
    with tempfile.TemporaryDirectory() as tmp_dir:
        if which == "generator":
            run_generator(tmp_dir)
        elif which == "discriminator":
            run_discriminator(tmp_dir)
        else:
            raise SystemExit(f"unknown target {which!r}")


if __name__ == "__main__":
    main()
