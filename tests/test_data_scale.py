"""Data pipeline at the reference's real manifest scale.

The reference ships a 103,945-row training manifest
(`/root/reference/HairPretraining/data/data_train.csv`, 61 classes); real
image archives can't exist in this environment, so these tests prove the
manifest/loader path at that row count with rows fanned out over a small
set of on-disk JPEGs (the loader dedupes nothing — every row is a sample).
"""

import csv
import os

import numpy as np
import pytest
from PIL import Image

from hairci.data.loader import DataLoader
from hairci.data.manifest import load_manifest

N_ROWS = 103_945   # data_train.csv row count
N_CLASSES = 61     # distinct labels in data_train.csv
N_FILES = 24


@pytest.fixture(scope="module")
def big_manifest(tmp_path_factory):
    root = tmp_path_factory.mktemp("scale")
    img_dir = root / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(N_FILES):
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"f{i}.jpg")
    ann = root / "train.csv"
    with open(ann, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "class"])
        for i in range(N_ROWS):
            w.writerow([f"f{i % N_FILES}.jpg", int(i % N_CLASSES)])
    return str(ann), str(img_dir)


def test_manifest_loads_at_reference_scale(big_manifest):
    ann, img_dir = big_manifest
    m = load_manifest(ann, img_dir)
    assert len(m) == N_ROWS
    assert m.num_classes == N_CLASSES
    assert m.label_indices.dtype == np.int32
    assert int(m.label_indices.max()) == N_CLASSES - 1
    assert os.path.isabs(m.paths[0]) or m.paths[0].startswith(img_dir)


def test_loader_iterates_reference_scale_manifest(big_manifest):
    ann, img_dir = big_manifest
    m = load_manifest(ann, img_dir)
    bs = 64
    loader = DataLoader(m, batch_size=bs, size=32, shuffle=True, seed=3,
                        drop_last=True)
    assert len(loader) == N_ROWS // bs
    it = iter(loader)
    seen = 0
    for _ in range(3):
        imgs, labels = next(it)
        assert imgs.shape == (bs, 32, 32, 3) and imgs.dtype == np.uint8
        assert labels.shape == (bs,)
        seen += bs
    # epoch reshuffle is deterministic per (seed, epoch) and differs by epoch
    loader.set_epoch(0)
    first0 = next(iter(loader))[1]
    loader.set_epoch(0)
    again0 = next(iter(loader))[1]
    loader.set_epoch(1)
    first1 = next(iter(loader))[1]
    np.testing.assert_array_equal(first0, again0)
    assert not np.array_equal(first0, first1)
    del it
