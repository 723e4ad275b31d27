import os

import numpy as np
from PIL import Image

from hairci.preprocess import process_folder_multiprocess, split_folder
from hairci.preprocess.face_toolkit import process_face_image


def _make_images(d, n=5):
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = np.zeros((40, 40, 3), dtype=np.uint8)
        arr[5:35, 5:35] = rng.integers(50, 255, (30, 30, 3))
        Image.fromarray(arr).save(d / f"img{i}.jpg")


def test_process_face_image(tmp_path):
    src = tmp_path / "raw"
    dst = tmp_path / "hair"
    src.mkdir()
    dst.mkdir()
    _make_images(src, 1)
    out = process_face_image(str(src / "img0.jpg"), str(dst))
    assert out and out.endswith("img0_hair.png")
    arr = np.asarray(Image.open(out))
    # background zeroed, content kept
    assert (arr[0, 0] == 0).all()
    assert arr[10:30, 10:30].sum() > 0


def test_process_folder(tmp_path):
    src = tmp_path / "raw"
    dst = tmp_path / "hair"
    src.mkdir()
    _make_images(src, 4)
    done = process_folder_multiprocess(str(src), str(dst), num_workers=1)
    assert len(done) == 4
    assert sorted(os.listdir(dst)) == [f"img{i}_hair.png" for i in range(4)]


def test_split_folder(tmp_path):
    src = tmp_path / "all"
    dst = tmp_path / "split"
    src.mkdir()
    _make_images(src, 5)
    dirs = split_folder(str(src), str(dst), chunk_size=2)
    assert len(dirs) == 3
    assert len(os.listdir(dirs[0])) == 2
    assert len(os.listdir(dirs[2])) == 1
