"""End-to-end numeric parity of the FULL composite Generator/Discriminator
converters against randomly-initialized reference torch modules.

This is the missing link for BASELINE config 1 (VERDICT round 1, item 2):
`convert_generator`/`convert_discriminator` consume a real
`training/networks_detr.py` state dict — exercising the composite naming
(backbone.0.body.*, text_encoder.*, transformer.*, dec_transformer.*,
bg_decoder.*, ...) end-to-end — and the flax models must reproduce the
torch outputs.

The reference modules are instantiated offline: torchvision is supplied
by tests/tv_stub.py, SwAV/HF downloads are monkeypatched to no-ops
(random init is exactly what we want), and the tokenizer is replaced by
a fixed-id fake (the tokenizer is glue, not math — the flax side is fed
the same pre-tokenized ids).
"""

import json

import numpy as np
import pytest

import jax

from conftest import import_reference_module

torch = pytest.importorskip("torch")

import tv_stub  # noqa: E402

tv_stub.install()

nd = import_reference_module("training.networks_detr")
med = import_reference_module("training.med")

pytestmark = pytest.mark.skipif(
    nd is None or med is None, reason="reference networks_detr unavailable"
)

# Tiny-but-complete dims. NOTE the reference hardcodes: N=9 elements
# (fc_z = Linear(z_dim*9), networks_detr.py:84), DETR transformer 6+6
# layers / nhead 8 / ffn 2048 (networks_detr.py:99-108), D decoders
# 6 layers ffn 2048 (networks_detr.py:239-243).
B, N, T = 2, 9, 16
VOCAB, BOS, PAD = 98, 96, 0
# hidden_dim is pinned to 256 by the reference (PositionEmbeddingSine is
# hardcoded to 128 feats/axis in build_backbone, networks_detr.py:44-47).
HID, BERT_F, IM_F, BG = 256, 32, 32, 32
TEXTS = [
    ["hello world", "ab", "buy now!", "", "x", "", "", "", ""],
    ["summer sale", "a longer str", "", "", "", "", "", "", ""],
]


class _FakeBatch:
    def __init__(self, input_ids, attention_mask):
        self.input_ids = input_ids
        self.attention_mask = attention_mask

    def to(self, device):
        return self


class _FakeTokenizer:
    """Fixed-output tokenizer: same ids are fed to the flax model."""

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
    rng = np.random.default_rng(7)
    ids = np.zeros((B * N, T), np.int64)
    mask = np.zeros((B * N, T), np.int64)
    for i, t in enumerate([s for row in TEXTS for s in row]):
        L = min(2 + len(t) // 3, T)  # token count varies per string
        ids[i, 0] = 2
        ids[i, 1:L] = rng.integers(3, BOS, size=L - 1)
        mask[i, :L] = 1
    return ids, mask


def _tiny_med_config(tmp_path):
    cfg = {
        "architectures": ["BertModel"],
        "attention_probs_dropout_prob": 0.1,
        "hidden_act": "gelu",
        "hidden_dropout_prob": 0.1,
        "hidden_size": BERT_F,
        "initializer_range": 0.02,
        "intermediate_size": 64,
        "layer_norm_eps": 1e-12,
        "max_position_embeddings": 64,
        "model_type": "bert",
        "num_attention_heads": 2,
        "num_hidden_layers": 2,
        "pad_token_id": PAD,
        "type_vocab_size": 2,
        "vocab_size": VOCAB - 2,  # resize_token_embeddings grows it to VOCAB
        "encoder_width": BERT_F,
        "add_cross_attention": True,
    }
    p = tmp_path / "med_config_tiny.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def _patch_offline(monkeypatch, fake_tok):
    monkeypatch.setattr(torch.hub, "load_state_dict_from_url",
                        lambda *a, **k: {}, raising=False)
    monkeypatch.setattr(
        med.BertModel, "from_pretrained",
        classmethod(lambda cls, name, config=None, add_pooling_layer=True, **kw:
                    cls(config, add_pooling_layer=add_pooling_layer)))
    monkeypatch.setattr(
        med.BertLMHeadModel, "from_pretrained",
        classmethod(lambda cls, name, config=None, **kw: cls(config)))
    monkeypatch.setattr(nd, "init_tokenizer", lambda: fake_tok)


def _torch_inputs():
    rng = np.random.default_rng(3)
    z = rng.normal(size=(B, N, 4)).astype(np.float32)
    labels = rng.integers(0, 8, size=(B, N))
    bbox = rng.uniform(0.1, 0.9, size=(B, N, 4)).astype(np.float32)
    padding_mask = np.zeros((B, N), bool)
    padding_mask[0, 6:] = True
    padding_mask[1, 2:] = True
    background = rng.normal(size=(B, 3, BG, BG)).astype(np.float32)
    text_len = np.array([[len(s) for s in row] for row in TEXTS], np.int64)
    return z, labels, bbox, padding_mask, background, text_len


def _flax_cfg():
    from layoutdetr_tpu.models.generator import GeneratorConfig

    return GeneratorConfig(
        z_dim=4, num_bbox_labels=8, max_elements=N, hidden_dim=HID,
        bert_f_dim=BERT_F, bert_num_heads=2, bert_num_encoder_layers=2,
        bert_num_decoder_layers=2, bert_intermediate_size=64,
        bert_max_position_embeddings=64,
        im_f_dim=IM_F, max_text_length=T, vocab_size=VOCAB,
        bos_token_id=BOS, pad_token_id=PAD,
        nhead=8, num_encoder_layers=6, num_decoder_layers=6,
        dim_feedforward=2048, background_size=BG,
    )


def test_full_generator_parity(monkeypatch, tmp_path):
    from layoutdetr_tpu.models.generator import Generator
    from layoutdetr_tpu.utils.torch_convert import convert_generator

    ids, tmask = _fixed_tokens()
    _patch_offline(monkeypatch, _FakeTokenizer(ids, tmask))
    torch.manual_seed(0)
    ref = nd.Generator(
        z_dim=4, num_bbox_labels=8, img_channels=3, img_height=BG, img_width=BG,
        c_dim=0, hidden_dim=HID, med_config=_tiny_med_config(tmp_path),
        bert_f_dim=BERT_F, bert_num_encoder_layers=2, bert_num_decoder_layers=2,
        bert_num_heads=2, background_size=BG, im_f_dim=IM_F, max_text_length=T,
    ).eval()

    z, labels, bbox, padding_mask, background, text_len = _torch_inputs()
    bbox_patch = torch.zeros(B, N, 3, 2, 2)  # only .size() is consumed
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
    params = convert_generator(sd, bert_encoder_layers=2, bert_decoder_layers=2,
                               vocab_size=VOCAB)

    cfg = _flax_cfg()
    g = Generator(cfg)
    out = g.apply(
        {"params": params},
        z=z, bbox_class=labels, bbox_real=bbox,
        text_ids=ids.reshape(B, N, T), text_mask=tmask.reshape(B, N, T),
        text_len=text_len, padding_mask=padding_mask,
        background=np.transpose(background, (0, 2, 3, 1)), reconst=True,
    )
    bbox_fake, loss_z, logit_cls, loss_lm, loss_text_len = jax.tree.map(np.asarray, out)

    np.testing.assert_allclose(bbox_fake, np.squeeze(bbox_fake_t), rtol=1e-4, atol=2e-5)
    valid = ~padding_mask
    np.testing.assert_allclose(logit_cls[valid], logit_cls_t, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(loss_z), float(loss_z_t), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(loss_lm), float(loss_lm_t), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(loss_text_len), float(loss_text_len_t),
                               rtol=1e-4, atol=1e-4)


def test_full_discriminator_parity(monkeypatch, tmp_path):
    from layoutdetr_tpu.models.discriminator import Discriminator
    from layoutdetr_tpu.utils.torch_convert import convert_discriminator

    ids, tmask = _fixed_tokens()
    _patch_offline(monkeypatch, _FakeTokenizer(ids, tmask))
    torch.manual_seed(1)
    ref = nd.Discriminator(
        num_bbox_labels=8, img_channels=3, img_height=BG, img_width=BG,
        c_dim=0, hidden_dim=HID, med_config=_tiny_med_config(tmp_path),
        bert_f_dim=BERT_F, bert_num_encoder_layers=2, bert_num_decoder_layers=2,
        bert_num_heads=2, background_size=BG, im_f_dim=IM_F, max_text_length=T,
    ).eval()

    _, labels, bbox, padding_mask, background, text_len = _torch_inputs()
    bbox_patch = torch.zeros(B, N, 3, 2, 2)
    with torch.no_grad():
        got_t = ref(
            torch.from_numpy(bbox), torch.from_numpy(labels), TEXTS, bbox_patch,
            torch.from_numpy(padding_mask), torch.from_numpy(background),
            None, reconst=True,
        )
    (logit_t, logit_u_t, bbox_pred_t, logit_cls_t, loss_lm_t, loss_tl_t,
     bg_rec_t, bbox_pred_u_t, logit_cls_u_t) = [x.detach().numpy() for x in got_t]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_discriminator(sd, bert_encoder_layers=2, bert_decoder_layers=2,
                                   vocab_size=VOCAB)

    cfg = _flax_cfg()
    d = Discriminator(cfg)
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
    np.testing.assert_allclose(logit, logit_t, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(logit_u, logit_u_t, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(bbox_pred[valid], bbox_pred_t, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(logit_cls[valid], logit_cls_t, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(bbox_pred_u[valid], bbox_pred_u_t, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(logit_cls_u[valid], logit_cls_u_t, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(loss_lm), float(loss_lm_t), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(loss_tl), float(loss_tl_t), rtol=1e-4, atol=1e-4)
    # torch NCHW -> NHWC
    np.testing.assert_allclose(bg_rec, np.transpose(bg_rec_t, (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-3)
