"""Generate a banner layout for one background + strings (inference CLI).

CLI parity target: reference generate.py:211-356 — same flags, same
background preprocessing modes, same padding-to-9 input construction,
same jitter/post-processing semantics (random-mode selection bug fixed,
see serving/postprocess.py), same outputs (bbox overlay PNG always;
HTML/Chrome-rendered banner when selenium+Chrome are present).

Checkpoint: an orbax directory saved by train.py (the --ckpt flag also
accepts a converted reference checkpoint, see utils/torch_convert.py).
"""

from __future__ import annotations

import os

import click
import numpy as np
import PIL.Image
import PIL.ImageFilter

from layoutdetr_tpu.serving.postprocess import (
    LABEL2INDEX,
    apply_postprocessing,
    jitter,
    save_bboxes_with_background,
)

MAX_N = 9


def preprocess_background(bg_path: str, mode: str):
    """Background preprocessing modes (reference generate.py:251-292).

    Returns (normalized_array [S,S,3] f32, background_orig PIL).
    """
    from layoutdetr_tpu.data.dataset import normalize_image

    background_orig = PIL.Image.open(bg_path).convert("RGB")
    w, h = background_orig.size
    if w > h and w > 4096:
        background_orig = background_orig.resize((4096, int(h / w * 4096)), PIL.Image.LANCZOS)
    elif h > w and h > 4096:
        background_orig = background_orig.resize((int(w / h * 4096), 4096), PIL.Image.LANCZOS)

    if mode == "256":
        background = np.array(background_orig.resize((256, 256), PIL.Image.LANCZOS))
    elif mode == "128":
        background = np.array(background_orig.resize((128, 128), PIL.Image.LANCZOS))
    elif mode == "blur":
        bg = background_orig.filter(PIL.ImageFilter.GaussianBlur(radius=3))
        background = np.array(bg.resize((1024, 1024), PIL.Image.LANCZOS))
    elif mode == "jpeg":
        idx = bg_path.rfind("/")
        bg_new = bg_path[:idx] + "_jpeg" + bg_path[idx:].replace(".png", ".jpg")
        background = np.array(PIL.Image.open(bg_new).convert("RGB").resize((1024, 1024), PIL.Image.LANCZOS))
    elif mode == "rec":
        idx = bg_path.rfind("/")
        bg_new = bg_path[:idx] + "_rec" + bg_path[idx:]
        background = np.array(PIL.Image.open(bg_new).convert("RGB").resize((1024, 1024), PIL.Image.LANCZOS))
    elif mode == "edge":
        bg = background_orig.convert("L").filter(PIL.ImageFilter.FIND_EDGES).convert("RGB")
        background = np.array(bg.resize((1024, 1024), PIL.Image.LANCZOS))
    else:
        background = np.array(background_orig.resize((1024, 1024), PIL.Image.LANCZOS))

    if background.ndim == 2:
        background = np.dstack([background] * 3)
    return normalize_image(background[:, :, :3]), background_orig


@click.command()
@click.option("--ckpt", "ckpt", required=True, help="Checkpoint: orbax directory or reference snapshot .pkl")
@click.option("--bg", type=str, required=True, help="Path of a background image")
@click.option("--bg-preprocessing", type=click.Choice(
    ["256", "128", "blur", "jpeg", "rec", "3x_mask", "edge", "none"]), default="256",
    show_default=True)
@click.option("--strings", type=str, required=True,
              help="Strings separated by '|'")
@click.option("--string-labels", "string_labels", type=str, required=True,
              help="Labels separated by '|'")
@click.option("--outfile", type=str, required=True)
@click.option("--out-jittering-strength", type=click.FloatRange(min=0.0, max=1.0),
              default=0.0, show_default=True)
@click.option("--out-postprocessing", type=click.Choice(
    ["horizontal_center_aligned", "horizontal_left_aligned", "none"]), default="none",
    show_default=True)
@click.option("--seed", type=int, default=0, show_default=True)
def generate_images(ckpt, bg, bg_preprocessing, strings, string_labels, outfile,
                    out_jittering_strength, out_postprocessing, seed):
    import jax

    from layoutdetr_tpu.data.tokenizer import LayoutTokenizer
    from layoutdetr_tpu.models.generator import Generator
    from layoutdetr_tpu.utils.checkpoint import load_generator_checkpoint
    from layoutdetr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    print(f'Loading background image from "{bg}"...')
    background, background_orig = preprocess_background(bg, bg_preprocessing)

    texts = strings.split("|")
    labels = [LABEL2INDEX[l] for l in string_labels.split("|")]
    assert len(texts) == len(labels) <= MAX_N
    n_real = len(texts)

    texts_padded = texts + [""] * (MAX_N - n_real)
    labels_padded = np.array(labels + [0] * (MAX_N - n_real), np.int64)
    mask = np.arange(MAX_N) < n_real

    print(f'Loading networks from "{ckpt}"...')
    params, gcfg = load_generator_checkpoint(ckpt)
    # The model consumes the training background resolution.
    if background.shape[0] != gcfg.background_size:
        img = PIL.Image.fromarray(
            np.uint8(np.clip((background * np.array([0.229, 0.224, 0.225]) +
                              np.array([0.485, 0.456, 0.406])) * 255, 0, 255)))
        background = np.array(img.resize((gcfg.background_size,) * 2, PIL.Image.LANCZOS))
        from layoutdetr_tpu.data.dataset import normalize_image

        background = normalize_image(background)

    tok = LayoutTokenizer(max_length=gcfg.max_text_length,
                          length_clip=getattr(gcfg, "text_len_table", None))
    tok.require_hf_for_checkpoint(ckpt)
    text_ids, text_mask, text_len = tok.encode_layouts([texts_padded])

    g = Generator(gcfg)
    z = np.random.RandomState(seed).randn(1, MAX_N, gcfg.z_dim).astype(np.float32)
    bbox_fake = np.asarray(jax.jit(g.apply)(
        params,
        z=z,
        bbox_class=labels_padded[None],
        bbox_real=np.zeros((1, MAX_N, 4), np.float32),
        text_ids=text_ids, text_mask=text_mask, text_len=text_len,
        padding_mask=~mask[None],
        background=background[None],
    ))

    if out_jittering_strength > 0.0:
        bbox_fake = jitter(bbox_fake, out_jittering_strength, seed=0)
    bbox_fake, bbox_alignment = apply_postprocessing(
        bbox_fake, mask[None], out_postprocessing, np.random.RandomState(seed)
    )

    outfile = os.path.abspath(outfile)
    os.makedirs(os.path.dirname(outfile), exist_ok=True)
    save_bboxes_with_background(
        bbox_fake[0], mask, labels_padded, background_orig, outfile + "_bboxes.png"
    )

    # Banner rendering: Chrome screenshot when selenium is present, PIL otherwise.
    from layoutdetr_tpu.serving.render import visualize_banner

    try:
        from layoutdetr_tpu.serving.render import make_browser

        browser = make_browser()
    except Exception:
        browser = None
    elements = []
    for i, label_name in enumerate(string_labels.split("|")):
        e = {"type": label_name, "text": texts[i],
             "style": {"fontFamily": "Arial", "color": ""}}
        if label_name == "button":
            e["buttonParams"] = {"backgroundColor": "", "backgroundImage": "", "radius": 0.5}
        elements.append(e)
    visualize_banner(bbox_fake[0], mask, elements, bbox_alignment,
                     background_orig, browser, ["image"], outfile)

    print(f"Saved {outfile}_bboxes.png")


if __name__ == "__main__":
    generate_images()
