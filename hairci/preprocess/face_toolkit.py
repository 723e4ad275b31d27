"""Offline hair-region extraction — rebuild of
`/root/reference/src/util/face_toolkit.py` (layer L0):
RetinaFace detection + FaRL/LaPa parsing → hair mask (class 10) → masked RGB
crop saved as `<stem>_hair.png` (black background), processed by a
multiprocessing pool with per-worker model init (`face_toolkit.py:15-20,147`).

This stage is offline CPU preprocessing, NOT on the TPU training hot path
(SURVEY.md §2.6). facer (torch models) is used when importable; otherwise a
documented luminance-threshold fallback keeps the CLI runnable for tests and
synthetic data.

CLI: python -m hairci.preprocess.face_toolkit --input_dir raw/ --output_dir hair/
"""

from __future__ import annotations

import argparse
import logging
import multiprocessing as mp
import os
from functools import partial
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

log = logging.getLogger(__name__)

HAIR_CLASS = 10  # LaPa label for hair (`face_toolkit.py:44`)

_WORKER_MODELS = None  # per-worker lazy init (`face_toolkit.py:15-20`)


def _init_models(device: str = "cpu"):
    global _WORKER_MODELS
    if _WORKER_MODELS is not None:
        return _WORKER_MODELS
    try:
        import facer  # type: ignore

        detector = facer.face_detector("retinaface/mobilenet", device=device)
        parser = facer.face_parser("farl/lapa/448", device=device)
        _WORKER_MODELS = (detector, parser)
    except Exception as e:  # noqa: BLE001
        log.warning("facer unavailable (%s); threshold fallback", e)
        _WORKER_MODELS = ()
    return _WORKER_MODELS


def hair_mask(image: np.ndarray, device: str = "cpu") -> Optional[np.ndarray]:
    """Boolean hair mask, or None when no face is found."""
    models = _init_models(device)
    if models:
        import torch

        detector, parser = models
        t = torch.from_numpy(image).permute(2, 0, 1)[None].to(device)
        with torch.inference_mode():
            faces = detector(t)
            if len(faces.get("rects", [])) == 0:
                return None
            faces = parser(t, faces)
        seg = faces["seg"]["logits"].softmax(dim=1).argmax(dim=1)[0]
        return (seg == HAIR_CLASS).cpu().numpy()
    # fallback: Otsu-threshold luminance segmentation (robust to JPEG
    # background artifacts, unlike a fixed cutoff)
    gray = image.astype(np.float32).mean(axis=-1)
    return gray > _otsu_threshold(gray)


def _otsu_threshold(gray: np.ndarray) -> float:
    hist, edges = np.histogram(gray.ravel(), bins=256, range=(0, 255))
    hist = hist.astype(np.float64)
    total = hist.sum()
    centers = (edges[:-1] + edges[1:]) / 2.0
    w0 = np.cumsum(hist)
    w1 = total - w0
    m0 = np.cumsum(hist * centers) / np.maximum(w0, 1e-12)
    m1 = (np.sum(hist * centers) - np.cumsum(hist * centers)) / np.maximum(
        w1, 1e-12)
    between = w0 * w1 * (m0 - m1) ** 2
    return float(centers[int(np.argmax(between))])


def process_face_image(path: str, output_dir: str,
                       device: str = "cpu") -> Optional[str]:
    """One image → `<stem>_hair.png` black-background hair crop
    (`process_face_image`, `face_toolkit.py:22-58`)."""
    try:
        image = np.asarray(Image.open(path).convert("RGB"))
    except Exception as e:  # noqa: BLE001
        log.warning("failed to read %s: %s", path, e)
        return None
    mask = hair_mask(image, device)
    if mask is None:
        log.info("no face in %s", path)
        return None
    out = image * mask[..., None].astype(np.uint8)
    stem = os.path.splitext(os.path.basename(path))[0]
    out_path = os.path.join(output_dir, f"{stem}_hair.png")
    Image.fromarray(out).save(out_path)
    return out_path


def process_folder_multiprocess(input_dir: str, output_dir: str,
                                num_workers: int = 4,
                                device: str = "cpu") -> List[str]:
    """Spawn-pool folder processing (`process_folder_multiprocess`,
    `face_toolkit.py:108-147`)."""
    os.makedirs(output_dir, exist_ok=True)
    paths = sorted(
        os.path.join(input_dir, f) for f in os.listdir(input_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
    worker = partial(process_face_image, output_dir=output_dir, device=device)
    if num_workers <= 1:
        results = [worker(p) for p in paths]
    else:
        ctx = mp.get_context("spawn")
        with ctx.Pool(num_workers) as pool:
            results = pool.map(worker, paths)
    done = [r for r in results if r]
    log.info("processed %d/%d images", len(done), len(paths))
    return done


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--device", default="cpu")
    args = p.parse_args(argv)
    process_folder_multiprocess(args.input_dir, args.output_dir,
                                args.num_workers, args.device)


if __name__ == "__main__":
    main()
