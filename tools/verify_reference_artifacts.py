"""One-command BASELINE-config-1 closure when the real reference
artifacts become available (VERDICT r3 missing-1 / next-8).

The machinery (restricted unpickler, composite converters, metric
harness) is fully tested on synthetic snapshots at production dims —
what's missing is the real 2.7 GB ``layoutdetr_ad_banner.pkl`` (README
Evaluation; loader contract reference legacy.py:23-59), the LayoutNet
metric weights (``pretrained/layoutnet_<ds>.pth.tar``, reference
metrics/metric_layoutnet.py:32), the FID InceptionV3 weights
(reference metrics/frechet_inception_distance.py:22) and the real
``bert-base-uncased`` vocab (reference training/blip.py:190-195) —
none downloadable offline. The moment any of them exist on disk, run:

    tools/verify_reference_artifacts.sh \
        --pkl   /path/layoutdetr_ad_banner.pkl \
        --data  /path/ads/val.zip \
        --vocab-dir /path/bert-base-uncased \
        [--layoutnet /path/layoutnet_ads.pth.tar] \
        [--inception /path/pt_inception-2015-12-05.pth] \
        [--max-items 1000]

It (1) converts the pickle with the restricted unpickler (no embedded
code executed), (2) runs a fixed-seed G_ema forward over the first val
batch and records the bbox digest, (3) runs evaluate.py for
layout-FID / image-FID / overlap+alignment+IoU+DocSim at reference
scale, and (4) appends a dated results section to docs/PARITY.md.

``--dry-run OUT_DIR`` exercises the IDENTICAL chain end-to-end against
a synthetic production-dims snapshot pickle (built from the reference's
own torch modules, the same protocol as tests/_full_dims_driver.py), a
synthetic val.zip, and a synthetic WordPiece vocab — proving every seam
the real run will cross.
"""

from __future__ import annotations

import argparse
import datetime
import glob
import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS_REAL = ("layout_fid50k_val,fid50k_val,"
                "overlap50k_alignment50k_layoutwise_iou50k_layoutwise_docsim50k_val")


def _md5(path: str, limit_mb: int = 64) -> str:
    """md5 of the first ``limit_mb`` MB (enough to fingerprint a 2.7 GB
    pickle without a long single-core read)."""
    h = hashlib.md5()
    todo = limit_mb * (1 << 20)
    with open(path, "rb") as f:
        while todo > 0:
            chunk = f.read(min(1 << 20, todo))
            if not chunk:
                break
            h.update(chunk)
            todo -= len(chunk)
    return h.hexdigest()


def _make_dryrun_vocab(out_dir: str) -> str:
    """Minimal bert-base-uncased-shaped vocab.txt (30522 entries, real
    special-token ids) so BertTokenizerFast — the exact backend the real
    vocab will use — drives the dry run."""
    vocab_dir = os.path.join(out_dir, "bert-base-uncased")
    os.makedirs(vocab_dir, exist_ok=True)
    path = os.path.join(vocab_dir, "vocab.txt")
    specials = {0: "[PAD]", 100: "[UNK]", 101: "[CLS]", 102: "[SEP]", 103: "[MASK]"}
    with open(path, "w") as f:
        for i in range(30522):
            f.write(specials.get(i, f"tok{i}") + "\n")
    return vocab_dir


def _make_dryrun_pkl(out_dir: str) -> str:
    """Synthetic snapshot pickle at the reference's production dims,
    dumped the way the reference training loop dumps real snapshots
    (plain pickle of live persistence-decorated modules,
    training_loop.py:396-411). Reuses tests/_full_dims_driver.py's
    offline-patched reference-module construction."""
    pkl_path = os.path.join(out_dir, "synthetic_prod_dims_snapshot.pkl")
    if os.path.exists(pkl_path):
        print(f"[dry-run] reusing {pkl_path}")
        return pkl_path
    script = r"""
import os, pickle, sys, tempfile
sys.path.insert(0, os.path.join(%(repo)r, "tests"))
import _full_dims_driver as fd
import torch
torch.set_num_threads(1)
ids, tmask = fd._fixed_tokens()
fd._patch_offline(fd._FakeTokenizer(ids, tmask))
torch.manual_seed(0)
with tempfile.TemporaryDirectory() as td:
    g = fd.nd.Generator(
        z_dim=4, num_bbox_labels=8, img_channels=3,
        img_height=fd.BG, img_width=fd.BG, c_dim=0, hidden_dim=fd.HID,
        med_config=fd._med_config(td),
        bert_f_dim=fd.BERT_F, bert_num_encoder_layers=fd.ENC_L,
        bert_num_decoder_layers=fd.DEC_L, bert_num_heads=fd.HEADS,
        background_size=fd.BG, im_f_dim=fd.IM_F, max_text_length=fd.T,
    ).eval()
    with open(%(pkl)r, "wb") as f:
        pickle.dump(dict(G=None, D=None, G_ema=g, augment_pipe=None,
                         training_set_kwargs={"max_elements": 9}), f)
print("dry-run snapshot written")
""" % {"repo": REPO, "pkl": pkl_path}
    print("[dry-run] building production-dims reference G (torch CPU, "
          "takes a few minutes on this host)...")
    subprocess.run([sys.executable, "-c", script], check=True, cwd=REPO)
    return pkl_path


def _make_dryrun_data(out_dir: str) -> str:
    sys.path.insert(0, REPO)
    from layoutdetr_tpu.data.synthetic import make_synthetic_zip

    path = os.path.join(out_dir, "val.zip")
    if not os.path.exists(path):
        make_synthetic_zip(path, num_samples=8, image_size=256, max_elements=6,
                           seed=1)
    return path


def _convert_aux(kind: str, src: str, out_dir: str) -> str:
    """Raw torch weights -> orbax pytree via the torch_convert CLI."""
    dest = os.path.join(out_dir, f"{kind}_converted")
    if not os.path.isdir(dest):
        subprocess.run(
            [sys.executable, "-m", "layoutdetr_tpu.utils.torch_convert",
             "--kind", kind, "--src", src, "--dest", dest],
            check=True, cwd=REPO)
    return dest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pkl", help="reference snapshot .pkl (layoutdetr_ad_banner.pkl)")
    ap.add_argument("--data", help="real val.zip (dataset_tool.py output)")
    ap.add_argument("--vocab-dir", help="directory containing bert-base-uncased vocab.txt")
    ap.add_argument("--layoutnet", help="raw layoutnet_<ds>.pth.tar (auto-converted)")
    ap.add_argument("--inception", help="FID InceptionV3 weights (.pth/.npz, pytorch-fid naming)")
    ap.add_argument("--max-items", type=int, default=50000)
    ap.add_argument("--parity-md", default=os.path.join(REPO, "docs", "PARITY.md"))
    ap.add_argument("--dry-run", metavar="OUT_DIR",
                    help="synthesize every artifact and run the identical chain")
    args = ap.parse_args()

    if args.dry_run:
        out_dir = os.path.abspath(args.dry_run)
        os.makedirs(out_dir, exist_ok=True)
        args.vocab_dir = _make_dryrun_vocab(out_dir)
        args.pkl = _make_dryrun_pkl(out_dir)
        args.data = _make_dryrun_data(out_dir)
    else:
        out_dir = os.path.abspath("reference_parity_run")
        os.makedirs(out_dir, exist_ok=True)
    if not args.pkl or not args.data:
        ap.error("--pkl and --data are required (or --dry-run OUT_DIR)")

    env = dict(os.environ)
    if args.vocab_dir:
        env["LAYOUTDETR_BERT_VOCAB"] = args.vocab_dir
        os.environ["LAYOUTDETR_BERT_VOCAB"] = args.vocab_dir

    section = [f"\n## Reference-artifact verification — "
               f"{datetime.date.today().isoformat()}"
               f"{' (DRY RUN, synthetic artifacts)' if args.dry_run else ''}\n"]
    section.append(f"- snapshot: `{args.pkl}` (md5[:64MB] `{_md5(args.pkl)}`)")
    section.append(f"- val data: `{args.data}`")
    section.append(f"- vocab: `{args.vocab_dir or 'ABSENT (hash fallback)'}`")

    # --- 1. restricted-unpickler conversion + fixed-seed bbox digest ---
    sys.path.insert(0, REPO)
    import numpy as np

    import jax

    from layoutdetr_tpu.data.dataset import LayoutDataset
    from layoutdetr_tpu.models.generator import Generator
    from layoutdetr_tpu.utils.checkpoint import load_generator_checkpoint

    print(f"[1/3] converting {args.pkl} with the restricted unpickler...")
    params, gcfg = load_generator_checkpoint(args.pkl)
    n_tensors = len(jax.tree.leaves(params))
    print(f"      {n_tensors} tensors; inferred config: "
          f"bert {gcfg.bert_num_encoder_layers}+{gcfg.bert_num_decoder_layers} "
          f"x{gcfg.bert_f_dim}, T={gcfg.max_text_length}, "
          f"bg={gcfg.background_size}")
    section.append(f"- conversion: {n_tensors} tensors -> flax pytree; inferred "
                   f"bert {gcfg.bert_num_encoder_layers}+{gcfg.bert_num_decoder_layers} "
                   f"width {gcfg.bert_f_dim}, T={gcfg.max_text_length}")

    dataset = LayoutDataset(args.data, background_size=gcfg.background_size,
                            max_text_length=gcfg.max_text_length,
                            text_len_clip=gcfg.text_len_table)
    dataset.tokenizer.require_hf_for_checkpoint(args.pkl)
    n = min(4, len(dataset))
    batch = dataset.collate(list(range(n)))
    z = jax.random.normal(jax.random.PRNGKey(0),
                          (n, gcfg.max_elements, gcfg.z_dim))
    print("[2/3] fixed-seed G_ema forward (PRNGKey(0), first "
          f"{n} val items)...")
    g = Generator(gcfg)
    bbox = np.asarray(jax.jit(g.apply)(
        params, z=z, bbox_real=batch["bboxes"], bbox_class=batch["labels"],
        text_ids=batch["text_ids"], text_mask=batch["text_mask"],
        text_len=batch["text_len"], padding_mask=batch["padding_mask"],
        background=batch["background"]))
    np.savez(os.path.join(out_dir, "bbox_fixed_seed.npz"), bbox=bbox)
    digest = hashlib.md5(np.round(bbox, 5).tobytes()).hexdigest()[:16]
    assert np.isfinite(bbox).all(), "non-finite bboxes from converted params"
    print(f"      bbox[{bbox.shape}] mean={bbox.mean():.6f} "
          f"std={bbox.std():.6f} digest={digest}")
    section.append(f"- fixed-seed bbox forward: shape {list(bbox.shape)}, "
                   f"mean {bbox.mean():.6f}, std {bbox.std():.6f}, "
                   f"digest(round5) `{digest}` "
                   f"(compare against the torch reference with the same "
                   f"z/seed to close bbox parity)")

    # --- 2. reference-scale metrics through the real evaluate.py CLI ---
    layoutnet_ckpt = (_convert_aux("layoutnet", args.layoutnet, out_dir)
                      if args.layoutnet else None)
    cmd = [sys.executable, os.path.join(REPO, "evaluate.py"),
           "--ckpt", args.pkl, "--data", args.data,
           "--metrics", METRICS_REAL,
           "--max-items", str(args.max_items), "--run-dir", out_dir]
    if layoutnet_ckpt:
        cmd += ["--layoutnet-ckpt", layoutnet_ckpt]
    if args.inception:
        cmd += ["--inception-ckpt", args.inception]
    print(f"[3/3] running metrics: {' '.join(cmd)}")
    subprocess.run(cmd, check=True, cwd=REPO, env=env)

    results = {}
    for jl in glob.glob(os.path.join(out_dir, "metric-*.jsonl")):
        with open(jl) as f:
            for line in f:
                rec = json.loads(line)
                results.update(rec.get("results", {}))
    real_ln = "real pretrained LayoutNet" if layoutnet_ckpt else \
        "FALLBACK random-feature LayoutNet (not reference scale)"
    real_in = "real InceptionV3" if args.inception else \
        "FALLBACK features (not reference scale)"
    section.append(f"- layout-FID detector: {real_ln}; image-FID: {real_in}")
    for k, v in sorted(results.items()):
        section.append(f"- `{k}` = {v:.6g}")
    section.append(f"- artifacts: `{out_dir}/`")

    with open(args.parity_md, "a") as f:
        f.write("\n".join(section) + "\n")
    print(f"\nAppended results to {args.parity_md}")
    print("\n".join(section))
    return 0


if __name__ == "__main__":
    sys.exit(main())
