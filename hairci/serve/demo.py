"""Interactive demo — rebuild of the reference Gradio app
(`/root/reference/HairPretraining/app/inference.py` + `app/app.py`):
segment → embed → retrieve end-to-end.

Pipeline parity:
  - `parsing_image` (`inference.py:145-185`): facer RetinaFace + FaRL/LaPa
    parse → hair mask (class 10) → black-bg crop + white-bg display image.
    facer/torch GPU models are not in this image, so segmentation degrades
    to a luminance-threshold mask when facer is unavailable (the offline
    preprocessing path in hairci/preprocess covers the real segmentation).
  - `build_index` (`inference.py:79-100`): batch extract_features →
    normalize → flat index (GalleryIndex = the FAISS IndexFlatL2
    equivalent), persisted embeddings + paths.
  - `retrieve_random_queries_with_save` (`inference.py:103-131`): query
    feature → top-k search → hole-filled white-background display images.
  - gradio UI (`app/app.py:31-97`) is constructed only when gradio is
    importable.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from hairci.retrieval.index import GalleryIndex

log = logging.getLogger(__name__)


def parsing_image(image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(hair_region black-bg, hair_display white-bg) uint8 arrays."""
    try:
        import facer  # type: ignore
        import torch

        device = "cpu"
        t = torch.from_numpy(image).permute(2, 0, 1)[None].to(device)
        detector = facer.face_detector("retinaface/mobilenet", device=device)
        parser = facer.face_parser("farl/lapa/448", device=device)
        with torch.inference_mode():
            faces = detector(t)
            faces = parser(t, faces)
        seg = faces["seg"]["logits"].softmax(dim=1).argmax(dim=1)[0]
        mask = (seg == 10).cpu().numpy()  # hair class
    except Exception as e:  # noqa: BLE001 — facer not installed / no face
        log.warning("facer unavailable (%s); luminance-threshold fallback", e)
        from hairci.preprocess.face_toolkit import _otsu_threshold

        gray = image.astype(np.float32).mean(axis=-1)
        mask = gray > _otsu_threshold(gray)
    hair_region = image * mask[..., None].astype(np.uint8)
    hair_display = np.where(mask[..., None], image, 255).astype(np.uint8)
    return hair_region, hair_display


def fill_holes_display(image: np.ndarray) -> np.ndarray:
    """binary_fill_holes white-background rendering (`inference.py:118-126`)."""
    try:
        from scipy.ndimage import binary_fill_holes

        mask = image.sum(axis=-1) > 0
        filled = binary_fill_holes(mask)
    except ImportError:
        filled = image.sum(axis=-1) > 0
    return np.where(filled[..., None], image, 255).astype(np.uint8)


class DemoPipeline:
    """`general_pipeline` equivalent (`inference.py:190-246`)."""

    def __init__(self, encoder, index_dir: str = "save/demo_index"):
        self.encoder = encoder  # a hairci retrieval encoder
        self.index_dir = index_dir
        self.index: Optional[GalleryIndex] = None

    def build_index(self, dataset_path: str, force: bool = False
                    ) -> GalleryIndex:
        faiss_file = os.path.join(self.index_dir, "index_hair_region.index")
        if not force and GalleryIndex.exists(self.index_dir):
            self.index = GalleryIndex.load(self.index_dir)
        elif not force and os.path.exists(faiss_file):
            # artifacts persisted by the reference demo (inference.py:96-98).
            # The gallery in that file was embedded by the REFERENCE's model;
            # queries go through self.encoder — so the spaces only match if
            # the checkpoint was converted (retrieval/torch_import.py).
            from hairci.retrieval.faiss_io import load_faiss_flat

            self.index = load_faiss_flat(faiss_file)
            log.info("imported reference faiss artifact %s (%d vectors, "
                     "dim %d)", faiss_file, len(self.index), self.index.dim)
            enc_dim = getattr(self.encoder, "feature_dim", None)
            if enc_dim is not None and enc_dim != self.index.dim:
                raise ValueError(
                    f"{faiss_file}: gallery dim {self.index.dim} != encoder "
                    f"output dim {enc_dim}. The imported gallery was embedded "
                    "by a different model — convert the matching torch "
                    "checkpoint with hairci.retrieval.torch_import or rebuild "
                    "the index with force=True.")
        else:
            self.index = self.encoder.extract_dataset_features(
                dataset_path, self.index_dir)
        return self.index

    def retrieve(self, image: np.ndarray, k: int = 5
                 ) -> Tuple[List[np.ndarray], List[float], List[str]]:
        """Segment the input, embed the hair region, return top-k display
        images + scores + paths."""
        assert self.index is not None, "call build_index first"
        hair_region, _ = parsing_image(image)
        tmp = os.path.join(self.index_dir, "_query.png")
        os.makedirs(self.index_dir, exist_ok=True)
        Image.fromarray(hair_region).save(tmp)
        feat = self.encoder.encode_single_image(tmp)
        paths, scores = self.encoder.retrieve_similar_images(
            feat, self.index, k)
        images = []
        for p in paths:
            arr = np.asarray(Image.open(p).convert("RGB"))
            images.append(fill_holes_display(arr))
        return images, [float(s) for s in scores], paths


def launch_gradio(pipeline: DemoPipeline, checkpoints: dict | None = None,
                  **launch_kw):
    """Gradio UI (`app/app.py:31-97`): input image → top-5 images + scores.
    Raises ImportError when gradio is not installed."""
    import gradio as gr

    def run(img):
        images, scores, _ = pipeline.retrieve(np.asarray(img), k=5)
        return [(Image.fromarray(im), f"{s:.3f}")
                for im, s in zip(images, scores)]

    with gr.Blocks(title="Hair-centric retrieval demo") as demo:
        gr.Markdown("# Hair-centric image retrieval")
        with gr.Row():
            input_img = gr.Image(label="Query image")
            gallery = gr.Gallery(label="Top-5 retrieved", columns=5)
        input_img.change(run, inputs=input_img, outputs=gallery)
    return demo.launch(**launch_kw)
