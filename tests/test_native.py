"""Native C++ data core (native/fastdata.cpp) parity vs PIL."""

import io

import numpy as np
import PIL.Image
import pytest

from layoutdetr_tpu.data import native

needs_native = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


@needs_native
def test_png_decode_exact_roundtrip():
    rng = np.random.default_rng(0)
    for shape, mode in [((21, 33, 3), "RGB"), ((16, 16), "L")]:
        arr = rng.integers(0, 255, shape, np.uint8)
        for level in (0, 6):
            buf = io.BytesIO()
            PIL.Image.fromarray(arr, mode).save(buf, format="png", compress_level=level)
            dec = native.decode_png(buf.getvalue())
            want = arr if arr.ndim == 3 else np.stack([arr] * 3, -1)
            np.testing.assert_array_equal(dec, want)


@needs_native
def test_lanczos_resize_matches_pil():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 48, 3), np.uint8)
    pil = np.array(PIL.Image.fromarray(img).resize((24, 24), PIL.Image.LANCZOS))
    nat = native.resize_lanczos(img, 24)
    diff = np.abs(pil.astype(int) - nat.astype(int))
    # The native path reproduces PIL's uint8 intermediate quantization;
    # only PIL's fixed-point coefficient rounding remains (<=1 LSB).
    assert diff.max() <= 1 and diff.mean() < 0.01


@needs_native
def test_dataset_native_path_matches_pil(tmp_path):
    from layoutdetr_tpu.data.dataset import LayoutDataset
    from layoutdetr_tpu.data.synthetic import make_synthetic_zip

    zip_path = make_synthetic_zip(str(tmp_path / "train.zip"), num_samples=2, image_size=48)
    ds_nat = LayoutDataset(zip_path, background_size=32, use_native=True)
    ds_pil = LayoutDataset(zip_path, background_size=32, use_native=False)
    a = ds_nat[0]["background"]
    b = ds_pil[0]["background"]
    # <=1 uint8 LSB of coefficient rounding, scaled by 1/(255*std).
    assert np.abs(a - b).max() < 2.0 / (255 * 0.224)
