"""Numeric parity: DETR transformer vs the reference torch implementation.

Converts a random-initialized reference Transformer's weights and checks
the full encoder+decoder output matches — validating the batch-first
packed-QKV reimplementation end to end (pos-embed handling, masks,
post-norm ordering).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import import_reference_module

torch = pytest.importorskip("torch")

ref_dt = import_reference_module("training.detr_transformer")
needs_ref = pytest.mark.skipif(ref_dt is None, reason="reference unavailable")

D, HEADS, FFN, ENC, DEC = 16, 2, 32, 2, 2


def _convert(ref, with_token):
    from layoutdetr_tpu.utils.torch_convert import convert_detr_transformer

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return convert_detr_transformer(sd, ENC, DEC, with_token=with_token)


def _inputs(seed=0, b=2, h=3, w=3, n=4):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(b, h, w, D)).astype(np.float32)
    pos = rng.normal(size=(b, h, w, D)).astype(np.float32)
    tgt = rng.normal(size=(b, n, D)).astype(np.float32)
    pad = np.zeros((b, n), bool)
    pad[1, 2:] = True
    return src, pos, tgt, pad


@needs_ref
@pytest.mark.parametrize("with_token", [False, True])
def test_detr_transformer_parity(with_token):
    from layoutdetr_tpu.models.detr_transformer import Transformer

    torch.manual_seed(0)
    cls = ref_dt.TransformerWithToken if with_token else ref_dt.Transformer
    ref = cls(d_model=D, nhead=HEADS, dim_feedforward=FFN,
              num_encoder_layers=ENC, num_decoder_layers=DEC,
              dropout=0.0, normalize_before=False).eval()
    params = _convert(ref, with_token)

    src, pos, tgt, pad = _inputs()
    # Reference takes NCHW src/pos and seq-first tgt.
    src_t = torch.from_numpy(src.transpose(0, 3, 1, 2))
    pos_t = torch.from_numpy(pos.transpose(0, 3, 1, 2))
    tgt_t = torch.from_numpy(tgt.transpose(1, 0, 2))
    mask_t = torch.zeros((2, 3, 3), dtype=torch.bool)
    with torch.no_grad():
        hs, _ = ref(src=src_t, mask=mask_t, pos_embed=pos_t, tgt=tgt_t,
                    tgt_key_padding_mask=torch.from_numpy(pad))
    if with_token:
        want = hs.numpy()  # already [B, N+1, D] after transpose inside
    else:
        want = hs.numpy()

    model = Transformer(d_model=D, nhead=HEADS, dim_feedforward=FFN,
                        num_encoder_layers=ENC, num_decoder_layers=DEC,
                        dropout=0.0, with_token=with_token)
    got, _ = model.apply({"params": params}, jnp.asarray(src), None,
                         jnp.asarray(pos), jnp.asarray(tgt), jnp.asarray(pad))
    got = np.asarray(got)

    # Compare valid rows (padded queries are meaningless).
    valid_rows = ~pad
    if with_token:
        valid_rows = np.concatenate([np.ones((2, 1), bool), valid_rows], axis=1)
    np.testing.assert_allclose(got[valid_rows], want[valid_rows], rtol=1e-4, atol=1e-4)