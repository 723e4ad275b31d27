"""Retrieval encoders — parity with
`/root/reference/src/models/hair_encoder.py` and `face_encoder.py`:

  HairEncoder: ViT-B/16 global-pool trunk at 224 (Resize224 + CenterCrop224
  + ImageNet normalize, `hair_encoder.py:44-51`), API
  `extract_dataset_features` (folder → embeddings.npy + image_paths.txt,
  `:103-142`), `encode_single_image` (`:165`), `retrieve_similar_images`
  (cosine top-k, `:180-198`).

  FaceEncoder: ViT_face/ViTs_face at 112 (`face_encoder.py:44-50`), same
  harness.

Checkpoints are hairci Orbax param trees ({"params": ...}); torch reference
weights can be converted via hairci.retrieval.torch_import.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hairci.aug import ops
from hairci.data.loader import decode_image
from hairci.models.face_vit import build_vit_face
from hairci.models.vit import build_vit
from hairci.retrieval.index import GalleryIndex

log = logging.getLogger(__name__)

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_image_folder(root: str) -> List[str]:
    """Recursive sorted listing (torchvision ImageFolder order)."""
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(IMAGE_EXTS):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


class _EncoderBase:
    img_size: int = 224

    def __init__(self, ckpt_path: Optional[str], batch_size: int = 64):
        self.ckpt_path = ckpt_path
        self.batch_size = batch_size
        self.params = self._init_params()
        if ckpt_path and os.path.exists(str(ckpt_path)):
            self.params = self._load_checkpoint(ckpt_path)
        elif ckpt_path:
            log.warning("checkpoint %s not found; using random init",
                        ckpt_path)
        self._embed = jax.jit(self._embed_fn)

    # -- subclass API ---------------------------------------------------
    @property
    def feature_dim(self) -> int:
        """Output embedding dimension (used to validate imported galleries)."""
        m = self.model
        return int(getattr(m, "embed_dim", None) or getattr(m, "dim"))

    def _init_params(self):
        raise NotImplementedError

    def _embed_fn(self, params, images):
        raise NotImplementedError

    def _load_checkpoint(self, path: str):
        if path.endswith((".pth", ".pt")):
            # reference-trained torch weights (hair_encoder.py:53-76 loads
            # MAE/SiameseIM ckpts non-strict; face_encoder.py:52-87 ViT_face)
            return self._load_torch(path)
        import orbax.checkpoint as ocp

        template = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          self.params)
        return ocp.StandardCheckpointer().restore(os.path.abspath(path),
                                                  template)

    def _load_torch(self, path: str):
        raise NotImplementedError(
            f"{type(self).__name__} has no torch-checkpoint converter")

    # -- host preprocessing (deterministic, exact) ----------------------
    def _preprocess(self, paths: Sequence[str]) -> np.ndarray:
        arrs = []
        for p in paths:
            a = decode_image(p, "resize_center_crop", self.img_size)
            if a is None:
                a = np.zeros((self.img_size, self.img_size, 3), np.uint8)
            arrs.append(a)
        return np.stack(arrs)

    def extract_features(self, images: np.ndarray) -> np.ndarray:
        out = self._embed(self.params, jnp.asarray(images))
        out = out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return np.asarray(out, dtype=np.float32)

    # -- reference public API -------------------------------------------
    def extract_dataset_features(self, dataset_path: str, output_dir: str
                                 ) -> GalleryIndex:
        paths = list_image_folder(dataset_path)
        if not paths:
            raise FileNotFoundError(f"no images under {dataset_path}")
        feats = []
        bs = self.batch_size
        for i in range(0, len(paths), bs):
            chunk = paths[i:i + bs]
            batch = self._preprocess(chunk)
            if len(chunk) < bs:  # pad to static shape
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], bs - len(chunk), 0)])
            feats.append(self.extract_features(batch)[: len(chunk)])
        index = GalleryIndex(np.concatenate(feats), paths, normalized=True)
        index.save(output_dir)
        log.info("saved %d embeddings to %s", len(index), output_dir)
        return index

    def load_embeddings(self, output_dir: str) -> GalleryIndex:
        return GalleryIndex.load(output_dir)

    def embeddings_exist(self, output_dir: str) -> bool:
        return GalleryIndex.exists(output_dir)

    def encode_single_image(self, image_path: str) -> np.ndarray:
        batch = self._preprocess([image_path])
        return self.extract_features(batch)[0]

    def retrieve_similar_images(self, query_feature: np.ndarray,
                                index: GalleryIndex, top_k: int = 5
                                ) -> Tuple[List[str], np.ndarray]:
        scores, paths = index.search_paths(query_feature[None], top_k)
        return paths[0], scores[0]


class HairEncoder(_EncoderBase):
    img_size = 224

    def __init__(self, ckpt_path: Optional[str] = None,
                 model_name: str = "vit_base_patch16", device=None,
                 batch_size: int = 64):
        self.model = build_vit(model_name, img_size=224, global_pool=True,
                               dtype=jnp.bfloat16)
        super().__init__(ckpt_path, batch_size)

    def _init_params(self):
        x = jnp.zeros((1, 224, 224, 3))
        return self.model.init(jax.random.key(0), x, train=False)["params"]

    def _embed_fn(self, params, images):
        # host already did resize+center-crop; device does float+normalize
        x = ops.normalize(ops.to_float(images))
        # CLS of forward_features (FeatureExtractor, hair_encoder.py:201-212)
        tokens = self.model.apply({"params": params}, x, train=False)
        return tokens[:, 0]

    def _load_torch(self, path: str):
        """Non-strict import like the reference (`hair_encoder.py:53-76`):
        timm-layout ViT keys at the top level or under common prefixes;
        anything unmatched keeps its random init."""
        from hairci.retrieval.torch_import import (
            convert_vit,
            load_torch_state_dict,
            merge_params,
        )

        sd = load_torch_state_dict(path)
        for prefix in ("", "backbone.vit.", "vit.", "module."):
            trial = {k[len(prefix):]: v for k, v in sd.items()
                     if k.startswith(prefix)} if prefix else dict(sd)
            if "cls_token" in trial and "blocks.0.attn.qkv.weight" in trial:
                conv, _ = convert_vit(trial, depth=self.model.depth,
                                      global_pool=self.model.global_pool)
                log.info("converted torch ViT weights (prefix=%r)", prefix)
                return merge_params(self.params, conv)
        raise ValueError(f"{path}: no recognizable ViT layout")


class FaceEncoder(_EncoderBase):
    img_size = 112

    def __init__(self, ckpt_path: Optional[str] = None,
                 model_name: str = "VIT", device=None, batch_size: int = 64):
        self.model = build_vit_face(model_name, dtype=jnp.bfloat16)
        super().__init__(ckpt_path, batch_size)

    def _init_params(self):
        x = jnp.zeros((1, 112, 112, 3))
        return self.model.init(jax.random.key(0), x)["params"]

    def _embed_fn(self, params, images):
        x = ops.normalize(ops.to_float(images))
        return self.model.apply({"params": params}, x)

    def _load_torch(self, path: str):
        from hairci.retrieval.torch_import import (
            convert_vit_face,
            load_torch_state_dict,
            merge_params,
        )

        sd = load_torch_state_dict(path)
        conv, _ = convert_vit_face(sd, depth=self.model.depth)
        return merge_params(self.params, conv)
