"""Native C++ image loader (hairci/native/imageio.cpp) vs the PIL path."""

import numpy as np
import pytest
from PIL import Image

from hairci.data.loader import DataLoader, decode_image
from hairci.data.manifest import Manifest
from hairci.native import imageio

pytestmark = pytest.mark.skipif(not imageio.available(),
                                reason="native imageio not buildable")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h) in enumerate([(320, 240), (96, 400), (224, 224),
                                (64, 48)]):
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = d / (f"{i}.jpg" if i % 2 == 0 else f"{i}.png")
        Image.fromarray(a).save(p)
        paths.append(str(p))
    # grayscale png (mode conversion) + corrupt file + missing file
    Image.fromarray(rng.integers(0, 256, (80, 80), dtype=np.uint8),
                    mode="L").save(d / "gray.png")
    paths.append(str(d / "gray.png"))
    (d / "corrupt.jpg").write_bytes(b"\xff\xd8not a real jpeg")
    paths.append(str(d / "corrupt.jpg"))
    paths.append(str(d / "missing.jpg"))
    return paths


def test_center_crop_bit_exact_vs_pil(image_dir):
    out, ok = imageio.decode_batch(image_dir, 128, imageio.MODE_CENTER_CROP)
    assert ok.tolist() == [True] * 5 + [False, False]
    for i in range(5):
        ref = decode_image(image_dir[i], "center_crop", 128)
        np.testing.assert_array_equal(out[i], ref)


def test_raw_resize_close_to_pil(image_dir):
    out, ok = imageio.decode_batch(image_dir[:5], 224,
                                   imageio.MODE_RAW_RESIZE)
    assert ok.all()
    for i in range(5):
        ref = decode_image(image_dir[i], "raw_resize", 224)
        d = np.abs(out[i].astype(int) - ref.astype(int))
        # float vs Pillow's 8-bit fixed-point resample coefficients
        assert d.max() <= 2 and d.mean() < 0.5, (i, d.max(), d.mean())


def test_loader_native_matches_pil(image_dir, tmp_path):
    import csv

    rows = [(p.rsplit("/", 1)[1], i % 2) for i, p in enumerate(image_dir)]
    csv_path = tmp_path / "m.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "class"])
        w.writerows(rows)
    from hairci.data import load_manifest

    img_dir = image_dir[0].rsplit("/", 1)[0]
    m = load_manifest(str(csv_path), img_dir)

    def batches(decoder):
        loader = DataLoader(m, batch_size=4, size=96, mode="center_crop",
                            shuffle=False, num_workers=2, decoder=decoder)
        return list(loader)

    nat, pil = batches("native"), batches("pil")
    assert len(nat) == len(pil)
    for (xi, yi), (xj, yj) in zip(nat, pil):
        np.testing.assert_array_equal(xi, xj)
        np.testing.assert_array_equal(yi, yj)


def test_native_requires_mode():
    m = Manifest(paths=["x.jpg"], labels=np.zeros(1, np.int64),
                 class_names=[0], label_indices=np.zeros(1, np.int32))
    loader = DataLoader(m, batch_size=1, mode="resize_center_crop",
                        decoder="native")
    with pytest.raises(ValueError):
        loader._native_decode(["x.jpg"])
