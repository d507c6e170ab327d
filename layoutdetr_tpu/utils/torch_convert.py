"""Torch state-dict -> flax param-tree converters.

The reference initializes from several torch checkpoints:
- SwAV ResNet50 downloaded inside model construction
  (detr_backbone.py:110-112) -> ``convert_resnet50``;
- HF ``bert-base-uncased`` encoder/decoder weights
  (networks_detr.py:92,127 via BertModel.from_pretrained)
  -> ``convert_bert_encoder`` / ``convert_bert_lm_head``;
- LayoutNet metric weights ``pretrained/layoutnet_<ds>.pth.tar``
  (metric_layoutnet.py:32) -> ``convert_layoutnet``;
- UP-DETR init and the 2.7GB full-model pickle (persistence-classes;
  extract a state_dict with the reference environment first, then feed
  the pieces to these converters).

All converters take ``{name: np.ndarray}`` (call ``torch.load(...,
map_location='cpu')`` and ``.numpy()`` upstream — no torch dependency
here) and return flax-style nested dicts matching this framework's
module definitions. Conventions converted:
- torch Linear weight [out, in] -> kernel [in, out] (transpose);
- torch Conv2d weight OIHW -> HWIO (transpose 2,3,1,0);
- torch LayerNorm weight/bias -> scale/bias;
- torch MultiheadAttention in_proj_weight [3D, D] -> in_proj_kernel
  [D, 3D]; out_proj -> out_kernel/out_bias.

Run as a CLI to convert a .pth/.pth.tar into an orbax checkpoint:
  python -m layoutdetr_tpu.utils.torch_convert --kind layoutnet \
      --src pretrained/layoutnet_ads_banner_collection_manual3x.pth.tar \
      --dest pretrained/layoutnet_ads
"""

from __future__ import annotations

from typing import Dict

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


def _lin(sd: StateDict, prefix: str) -> dict:
    out = {"kernel": sd[f"{prefix}.weight"].T.copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].copy()
    return out


def _ln(sd: StateDict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"].copy(), "bias": sd[f"{prefix}.bias"].copy()}


def _conv(sd: StateDict, key: str) -> Array:
    return np.transpose(sd[key], (2, 3, 1, 0)).copy()  # OIHW -> HWIO


def _bn(sd: StateDict, prefix: str) -> dict:
    return {
        "weight": sd[f"{prefix}.weight"].copy(),
        "bias": sd[f"{prefix}.bias"].copy(),
        "running_mean": sd[f"{prefix}.running_mean"].copy(),
        "running_var": sd[f"{prefix}.running_var"].copy(),
    }


# ---------------------------------------------------------------------------
# ResNet50 (torchvision naming; SwAV checkpoints use module.-prefixed keys)
# ---------------------------------------------------------------------------

_STAGE_SIZES = (3, 4, 6, 3)


def convert_resnet50(sd: StateDict) -> dict:
    """torchvision resnet50 state dict -> models.resnet.ResNet50 params."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params: dict = {
        "conv1": {"kernel": _conv(sd, "conv1.weight")},
        "bn1": _bn(sd, "bn1"),
    }
    for stage, blocks in enumerate(_STAGE_SIZES, start=1):
        for b in range(blocks):
            t = f"layer{stage}.{b}"
            entry = {
                "conv1": {"kernel": _conv(sd, f"{t}.conv1.weight")},
                "bn1": _bn(sd, f"{t}.bn1"),
                "conv2": {"kernel": _conv(sd, f"{t}.conv2.weight")},
                "bn2": _bn(sd, f"{t}.bn2"),
                "conv3": {"kernel": _conv(sd, f"{t}.conv3.weight")},
                "bn3": _bn(sd, f"{t}.bn3"),
            }
            if f"{t}.downsample.0.weight" in sd:
                entry["downsample_conv"] = {"kernel": _conv(sd, f"{t}.downsample.0.weight")}
                entry["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
            params[f"layer{stage}_{b}"] = entry
    return params


# ---------------------------------------------------------------------------
# BERT (HF naming, med.py module layout)
# ---------------------------------------------------------------------------

def _bert_layer(sd: StateDict, prefix: str, has_cross: bool) -> dict:
    layer = {
        "attention": {
            "self": {
                "query": _lin(sd, f"{prefix}.attention.self.query"),
                "key": _lin(sd, f"{prefix}.attention.self.key"),
                "value": _lin(sd, f"{prefix}.attention.self.value"),
            },
            "output_dense": _lin(sd, f"{prefix}.attention.output.dense"),
            "output_layernorm": _ln(sd, f"{prefix}.attention.output.LayerNorm"),
        },
        "intermediate_dense": _lin(sd, f"{prefix}.intermediate.dense"),
        "output_dense": _lin(sd, f"{prefix}.output.dense"),
        "output_layernorm": _ln(sd, f"{prefix}.output.LayerNorm"),
    }
    if has_cross and f"{prefix}.crossattention.self.query.weight" in sd:
        layer["crossattention"] = {
            "self": {
                "query": _lin(sd, f"{prefix}.crossattention.self.query"),
                "key": _lin(sd, f"{prefix}.crossattention.self.key"),
                "value": _lin(sd, f"{prefix}.crossattention.self.value"),
            },
            "output_dense": _lin(sd, f"{prefix}.crossattention.output.dense"),
            "output_layernorm": _ln(sd, f"{prefix}.crossattention.output.LayerNorm"),
        }
    return layer


def _resize_vocab(emb: Array, vocab_size: int) -> Array:
    """Pad token embeddings for added special tokens ([DEC]/[ENC],
    networks_detr.py:93 resize_token_embeddings)."""
    if emb.shape[0] >= vocab_size:
        return emb[:vocab_size].copy()
    extra = np.random.RandomState(0).normal(0.0, 0.02, (vocab_size - emb.shape[0], emb.shape[1]))
    return np.concatenate([emb, extra.astype(emb.dtype)], axis=0)


def convert_bert_encoder(sd: StateDict, num_layers: int, vocab_size: int = 30524,
                         prefix: str = "") -> dict:
    """HF BertModel state dict -> models.bert.BertModel params."""
    p = prefix
    params: dict = {
        "embeddings": {
            "word_embeddings": _resize_vocab(sd[f"{p}embeddings.word_embeddings.weight"], vocab_size),
            "position_embeddings": sd[f"{p}embeddings.position_embeddings.weight"].copy(),
            "layernorm": _ln(sd, f"{p}embeddings.LayerNorm"),
        }
    }
    for i in range(num_layers):
        params[f"layer_{i}"] = _bert_layer(sd, f"{p}encoder.layer.{i}", has_cross=True)
    return params


def convert_bert_lm_head(sd: StateDict, num_layers: int, vocab_size: int = 30524,
                         prefix: str = "") -> dict:
    """HF BertLMHeadModel/BertForMaskedLM state dict -> BertLMHeadModel params."""
    p = prefix
    bert = convert_bert_encoder(sd, num_layers, vocab_size, prefix=f"{p}bert.")
    decoder_kernel = _resize_vocab(sd[f"{p}cls.predictions.decoder.weight"], vocab_size).T.copy()
    bias_key = (f"{p}cls.predictions.decoder.bias"
                if f"{p}cls.predictions.decoder.bias" in sd
                else f"{p}cls.predictions.bias")
    bias = sd[bias_key]
    bias = np.concatenate([bias, np.zeros(vocab_size - bias.shape[0], bias.dtype)]) \
        if bias.shape[0] < vocab_size else bias[:vocab_size]
    cls = {
        "transform_dense": _lin(sd, f"{p}cls.predictions.transform.dense"),
        "transform_layernorm": _ln(sd, f"{p}cls.predictions.transform.LayerNorm"),
        "decoder": {"kernel": decoder_kernel, "bias": bias.copy()},
    }
    return {"bert": bert, "cls": cls}


# ---------------------------------------------------------------------------
# DETR transformer (training/detr_transformer.py naming; also covers the
# UP-DETR init checkpoints, training_loop.py:138-140)
# ---------------------------------------------------------------------------

def _mha(sd: StateDict, prefix: str) -> dict:
    return {
        "in_proj_kernel": sd[f"{prefix}.in_proj_weight"].T.copy(),
        "in_proj_bias": sd[f"{prefix}.in_proj_bias"].copy(),
        "out_kernel": sd[f"{prefix}.out_proj.weight"].T.copy(),
        "out_bias": sd[f"{prefix}.out_proj.bias"].copy(),
    }


def convert_detr_transformer(sd: StateDict, num_encoder_layers: int = 6,
                             num_decoder_layers: int = 6, prefix: str = "",
                             with_token: bool = False) -> dict:
    """Reference Transformer/TransformerWithToken state dict ->
    models.detr_transformer.Transformer params."""
    p = prefix
    params: dict = {}
    for i in range(num_encoder_layers):
        t = f"{p}encoder.layers.{i}"
        params[f"encoder_layers_{i}"] = {
            "self_attn": _mha(sd, f"{t}.self_attn"),
            "linear1": _lin(sd, f"{t}.linear1"),
            "linear2": _lin(sd, f"{t}.linear2"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
        }
    for i in range(num_decoder_layers):
        t = f"{p}decoder.layers.{i}"
        params[f"decoder_layers_{i}"] = {
            "self_attn": _mha(sd, f"{t}.self_attn"),
            "multihead_attn": _mha(sd, f"{t}.multihead_attn"),
            "linear1": _lin(sd, f"{t}.linear1"),
            "linear2": _lin(sd, f"{t}.linear2"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "norm3": _ln(sd, f"{t}.norm3"),
        }
    params["decoder_norm"] = _ln(sd, f"{p}decoder.norm")
    if with_token and f"{p}token" in sd:
        params["token"] = sd[f"{p}token"].copy()  # [1,1,D]
    return params


# ---------------------------------------------------------------------------
# LayoutNet (networks_layoutnet.py naming)
# ---------------------------------------------------------------------------

def _torch_encoder_layer(sd: StateDict, prefix: str) -> dict:
    return {
        "self_attn": {
            "in_proj_kernel": sd[f"{prefix}.self_attn.in_proj_weight"].T.copy(),
            "in_proj_bias": sd[f"{prefix}.self_attn.in_proj_bias"].copy(),
            "out_kernel": sd[f"{prefix}.self_attn.out_proj.weight"].T.copy(),
            "out_bias": sd[f"{prefix}.self_attn.out_proj.bias"].copy(),
        },
        "linear1": _lin(sd, f"{prefix}.linear1"),
        "linear2": _lin(sd, f"{prefix}.linear2"),
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
    }


def convert_layoutnet(sd: StateDict, num_layers: int = 4) -> dict:
    """LayoutNet .pth.tar state dict -> models.layoutnet.LayoutNet params."""
    params: dict = {
        "emb_label_table": sd["emb_label.weight"].copy(),
        "pos_token": sd["pos_token"].squeeze(1).copy(),  # [50,1,D] -> [50,D]
        "fc_bbox": _lin(sd, "fc_bbox"),
        "enc_fc_in": _lin(sd, "enc_fc_in"),
        "fc_out_disc": _lin(sd, "fc_out_disc"),
        "dec_fc_in": _lin(sd, "dec_fc_in"),
        "fc_out_cls": _lin(sd, "fc_out_cls"),
        "fc_out_bbox": _lin(sd, "fc_out_bbox"),
        "enc_transformer": {
            "token": sd["enc_transformer.token"].transpose(1, 0, 2).copy()
            if sd["enc_transformer.token"].ndim == 3 else sd["enc_transformer.token"].copy(),
        },
    }
    for i in range(num_layers):
        params["enc_transformer"][f"layers_{i}"] = _torch_encoder_layer(
            sd, f"enc_transformer.core.layers.{i}")
        params[f"dec_layers_{i}"] = _torch_encoder_layer(sd, f"dec_transformer.layers.{i}")
    return params


# ---------------------------------------------------------------------------
# Composite converters for the full reference Generator/Discriminator
# (networks_detr.py naming, e.g. from tools/extract_reference_pkl.py output)
# ---------------------------------------------------------------------------

def _conv1x1_as_dense(sd: StateDict, prefix: str) -> dict:
    """torch 1x1 Conv2d [O, I, 1, 1] -> Dense kernel [I, O]."""
    out = {"kernel": sd[f"{prefix}.weight"][:, :, 0, 0].T.copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].copy()
    return out


def _mlp(sd: StateDict, prefix: str, num_layers: int = 3) -> dict:
    return {f"layers_{i}": _lin(sd, f"{prefix}.layers.{i}") for i in range(num_layers)}


def _subdict(sd: StateDict, prefix: str) -> StateDict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _fcl(sd: StateDict, prefix: str) -> dict:
    """StyleGAN2 FullyConnectedLayer [out,in] -> our weight [in,out]."""
    out = {"weight": sd[f"{prefix}.weight"].T.copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].copy()
    return out


def convert_stylegan2_decoder(sd: StateDict, prefix: str = "") -> dict:
    """Reference Decoder (mapping + synthesis, networks_stylegan2.py:971)
    state dict -> models.stylegan2.Decoder params."""
    p = prefix
    mapping: dict = {}
    i = 0
    while f"{p}mapping.fc{i}.weight" in sd:
        mapping[f"fc{i}"] = _fcl(sd, f"{p}mapping.fc{i}")
        i += 1

    synthesis: dict = {}
    resolutions = sorted({int(k[len(f"{p}synthesis.b"):].split(".")[0])
                          for k in sd if k.startswith(f"{p}synthesis.b")})
    for res in resolutions:
        bp = f"{p}synthesis.b{res}"
        block: dict = {}
        if f"{bp}.const" in sd:
            block["const"] = np.transpose(sd[f"{bp}.const"], (1, 2, 0)).copy()  # CHW->HWC
        for conv in ("conv0", "conv1"):
            if f"{bp}.{conv}.weight" not in sd:
                continue
            entry = {
                "weight": np.transpose(sd[f"{bp}.{conv}.weight"], (2, 3, 1, 0)).copy(),
                "bias": sd[f"{bp}.{conv}.bias"].copy(),
                "affine": _fcl(sd, f"{bp}.{conv}.affine"),
            }
            if f"{bp}.{conv}.noise_strength" in sd:
                entry["noise_strength"] = np.asarray(sd[f"{bp}.{conv}.noise_strength"]).copy()
            if f"{bp}.{conv}.noise_const" in sd:
                entry["noise_const"] = sd[f"{bp}.{conv}.noise_const"].copy()
            block[conv] = entry
        if f"{bp}.torgb.weight" in sd:
            block["torgb"] = {
                "weight": np.transpose(sd[f"{bp}.torgb.weight"], (2, 3, 1, 0)).copy(),
                "bias": sd[f"{bp}.torgb.bias"].copy(),
                "affine": _fcl(sd, f"{bp}.torgb.affine"),
            }
        if f"{bp}.skip.weight" in sd:
            block["skip"] = {"weight": np.transpose(sd[f"{bp}.skip.weight"], (2, 3, 1, 0)).copy()}
        synthesis[f"b{res}"] = block
    return {"mapping": mapping, "synthesis": synthesis}


def _reconst_decoder(sd: StateDict, dec_prefix: str, fc_in: str, pos_token_key: str,
                     num_layers: int = 6) -> dict:
    out = {
        "dec_fc_in": _lin(sd, fc_in),
        "pos_token": sd[pos_token_key].squeeze(1).copy(),
    }
    for i in range(num_layers):
        out[f"dec_layers_{i}"] = _torch_encoder_layer(sd, f"{dec_prefix}.layers.{i}")
    return out


def convert_generator(sd: StateDict, num_encoder_layers: int = 6,
                      num_decoder_layers: int = 6, bert_encoder_layers: int = 12,
                      bert_decoder_layers: int = 2, vocab_size: int = 30524) -> dict:
    """Full reference Generator state dict (networks_detr.py:65-131 naming)
    -> models.generator.Generator params."""
    params: dict = {
        "backbone": convert_resnet50(_subdict(sd, "backbone.0.body.")),
        "input_proj": _conv1x1_as_dense(sd, "input_proj"),
        "fc_z": _lin(sd, "fc_z"),
        "emb_label": sd["emb_label.weight"].copy(),
        "enc_text_len": sd["enc_text_len.weight"].copy(),
        "fc_in": _mlp(sd, "fc_in"),
        "text_encoder": {"bert": convert_bert_encoder(
            sd, bert_encoder_layers, vocab_size, prefix="text_encoder.")},
        "transformer": convert_detr_transformer(
            sd, num_encoder_layers, num_decoder_layers, prefix="transformer."),
        "bbox_embed": _mlp(sd, "bbox_embed"),
        "fc_z_rec": _lin(sd, "fc_z_rec"),
        "fc_out_cls": _lin(sd, "fc_out_cls"),
        "fc_text_len_rec": _lin(sd, "fc_text_len_rec"),
        "text_decoder": convert_bert_lm_head(
            sd, bert_decoder_layers, vocab_size, prefix="text_decoder."),
    }
    return params


def convert_discriminator(sd: StateDict, num_encoder_layers: int = 6,
                          num_decoder_layers: int = 6, bert_encoder_layers: int = 12,
                          bert_decoder_layers: int = 2, vocab_size: int = 30524) -> dict:
    """Full reference Discriminator state dict (networks_detr.py:190-277
    naming) -> models.discriminator.Discriminator params."""
    enc_tf = convert_detr_transformer(
        sd, num_encoder_layers, num_decoder_layers, prefix="enc_transformer.",
        with_token=True)
    uncond_layers = {
        f"layers_{i}": _torch_encoder_layer(sd, f"enc_transformer_uncond.core.layers.{i}")
        for i in range(6)
    }
    tok = sd["enc_transformer_uncond.token"]
    uncond = dict(uncond_layers, token=tok.transpose(1, 0, 2).copy() if tok.ndim == 3 else tok.copy())
    params: dict = {
        "backbone": convert_resnet50(_subdict(sd, "backbone.0.body.")),
        "input_proj": _conv1x1_as_dense(sd, "input_proj"),
        "fc_bbox": _lin(sd, "fc_bbox"),
        "emb_label": sd["emb_label.weight"].copy(),
        "enc_text_len": sd["enc_text_len.weight"].copy(),
        "enc_fc_in": _mlp(sd, "enc_fc_in"),
        "text_encoder": {"bert": convert_bert_encoder(
            sd, bert_encoder_layers, vocab_size, prefix="text_encoder.")},
        "enc_transformer": enc_tf,
        "fc_out_disc": _lin(sd, "fc_out_disc"),
        "fc_bbox_uncond": _lin(sd, "fc_bbox_uncond"),
        "emb_label_uncond": sd["emb_label_uncond.weight"].copy(),
        "enc_fc_in_uncond": _mlp(sd, "enc_fc_in_uncond"),
        "enc_transformer_uncond": uncond,
        "fc_out_disc_uncond": _lin(sd, "fc_out_disc_uncond"),
        "dec_transformer": _reconst_decoder(sd, "dec_transformer", "dec_fc_in", "pos_token"),
        "bbox_embed": _lin(sd, "bbox_embed"),
        "fc_out_cls": _lin(sd, "fc_out_cls"),
        "fc_text_len_rec": _lin(sd, "fc_text_len_rec"),
        "text_decoder": convert_bert_lm_head(
            sd, bert_decoder_layers, vocab_size, prefix="text_decoder."),
        "bg_decoder": convert_stylegan2_decoder(sd, prefix="bg_decoder."),
        "dec_transformer_uncond": _reconst_decoder(
            sd, "dec_transformer_uncond", "dec_fc_in_uncond", "pos_token_uncond"),
        "bbox_embed_uncond": _lin(sd, "bbox_embed_uncond"),
        "fc_out_cls_uncond": _lin(sd, "fc_out_cls_uncond"),
    }
    return params


# ---------------------------------------------------------------------------
# FID InceptionV3 (pytorch-fid pt_inception-2015-12-05 / torchvision naming)
# ---------------------------------------------------------------------------

_INCEPTION_BLOCKS = {
    "Conv2d_1a_3x3": None, "Conv2d_2a_3x3": None, "Conv2d_2b_3x3": None,
    "Conv2d_3b_1x1": None, "Conv2d_4a_3x3": None,
    "Mixed_5b": ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"),
    "Mixed_5c": ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"),
    "Mixed_5d": ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"),
    "Mixed_6a": ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"),
    "Mixed_6b": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
    "Mixed_6c": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
    "Mixed_6d": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
    "Mixed_6e": ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"),
    "Mixed_7a": ("branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
                 "branch7x7x3_3", "branch7x7x3_4"),
    "Mixed_7b": ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"),
    "Mixed_7c": ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"),
}


def _basic_conv(sd: StateDict, prefix: str) -> dict:
    return {
        "conv": _conv(sd, f"{prefix}.conv.weight"),
        "bn_weight": sd[f"{prefix}.bn.weight"].copy(),
        "bn_bias": sd[f"{prefix}.bn.bias"].copy(),
        "bn_mean": sd[f"{prefix}.bn.running_mean"].copy(),
        "bn_var": sd[f"{prefix}.bn.running_var"].copy(),
    }


def convert_inception(sd: StateDict) -> dict:
    """pytorch-fid / torchvision InceptionV3 state dict ->
    models.inception.InceptionV3 params (fc and AuxLogits are dropped:
    FID uses the 2048-dim pool3 features)."""
    params: dict = {}
    for block, branches in _INCEPTION_BLOCKS.items():
        if branches is None:
            params[block] = _basic_conv(sd, block)
        else:
            params[block] = {br: _basic_conv(sd, f"{block}.{br}") for br in branches}
    return params


def load_torch_state_dict(path: str) -> StateDict:
    """torch.load a .pth/.pth.tar (path or URL, cached) -> numpy arrays."""
    import torch

    from layoutdetr_tpu.utils.url import is_url, open_url

    if is_url(path, allow_file_urls=True):
        path = open_url(path, return_filename=True)
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


def main():
    import argparse

    from layoutdetr_tpu.utils.checkpoint import save_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True,
                    choices=["resnet50", "bert_encoder", "bert_lm_head", "layoutnet",
                             "detr_transformer", "stylegan2_decoder",
                             "generator", "discriminator", "inception"])
    ap.add_argument("--src", required=True,
                    help=".pth/.pth.tar state dict, .npz from tools/extract_reference_pkl.py, "
                         "or a reference snapshot .pkl (read safely in-process — no "
                         "reference env needed; see utils/legacy_pkl.py)")
    ap.add_argument("--dest", required=True)
    ap.add_argument("--num-layers", type=int, default=12)
    ap.add_argument("--pkl-key", default=None,
                    help="which module to take from a snapshot .pkl "
                         "(G_ema/G/D; default: G_ema for --kind generator, D for discriminator)")
    args = ap.parse_args()

    pkl_meta = None
    if args.src.endswith(".npz"):
        sd = dict(np.load(args.src))
    elif args.src.endswith(".pkl"):
        from layoutdetr_tpu.utils.legacy_pkl import infer_bert_layers, load_network_pkl

        assert args.kind in ("generator", "discriminator"), \
            "--src *.pkl extracts full G/D modules; use --kind generator|discriminator"
        key = args.pkl_key or ("D" if args.kind == "discriminator" else "G_ema")
        nets = load_network_pkl(args.src)
        if nets.get(key) is None and key == "G_ema":
            key = "G"
        assert nets.get(key) is not None, f"{args.src} has no {key!r} module"
        sd = nets[key]["state_dict"]
        pkl_meta = {"pkl_key": key, "class": nets[key]["class"],
                    **infer_bert_layers(sd)}
        print(f"extracted {key} ({pkl_meta['class']}): {len(sd)} tensors, "
              f"{pkl_meta['bert_encoder_layers']}+{pkl_meta['bert_decoder_layers']} "
              f"BERT layers, vocab {pkl_meta['vocab_size']}")
    else:
        sd = load_torch_state_dict(args.src)

    if pkl_meta:
        kw = dict(bert_encoder_layers=pkl_meta["bert_encoder_layers"] or 12,
                  bert_decoder_layers=pkl_meta["bert_decoder_layers"] or 2,
                  vocab_size=pkl_meta["vocab_size"] or 30524)
        cg = lambda: convert_generator(sd, **kw)  # noqa: E731
        cd = lambda: convert_discriminator(sd, **kw)  # noqa: E731
    else:
        cg = lambda: convert_generator(sd)  # noqa: E731
        cd = lambda: convert_discriminator(sd)  # noqa: E731
    tree = {
        "resnet50": lambda: convert_resnet50(sd),
        "bert_encoder": lambda: convert_bert_encoder(sd, args.num_layers),
        "bert_lm_head": lambda: convert_bert_lm_head(sd, args.num_layers),
        "layoutnet": lambda: convert_layoutnet(sd),
        "detr_transformer": lambda: convert_detr_transformer(sd),
        "stylegan2_decoder": lambda: convert_stylegan2_decoder(sd),
        "generator": cg,
        "discriminator": cd,
        "inception": lambda: convert_inception(sd),
    }[args.kind]()
    save_checkpoint(args.dest, {"params": tree})
    if args.kind in ("generator", "discriminator", "bert_encoder", "bert_lm_head"):
        # Mark checkpoints whose embedded BERT weights require real HF
        # WordPiece ids (see LayoutTokenizer.require_hf_for_checkpoint).
        import json

        with open(args.dest + ".converted.json", "w") as f:
            json.dump({"converted_from_torch": True, "hf_token_ids": True,
                       "kind": args.kind, "src": args.src}, f)
    print(f"converted {args.kind}: {args.src} -> {args.dest}")


if __name__ == "__main__":
    main()
