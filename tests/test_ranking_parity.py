"""End-to-end kNN ranking parity (the SURVEY.md §3.3 contract): features
from a torch model vs the Flax model with converted weights must produce
IDENTICAL retrieval ranking and kNN predictions through the full eval path
(center-crop transform → embed → L2 normalize → cosine kNN)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hairci.aug.pipelines import knn_transform  # noqa: E402
from hairci.eval.knn import knn_predict  # noqa: E402
from hairci.models.resnet import build_resnet  # noqa: E402
from hairci.retrieval.index import GalleryIndex  # noqa: E402
from hairci.retrieval.torch_import import convert_resnet  # noqa: E402
from tests.test_torch_import import TorchResNet18, _randomize_bn_stats  # noqa: E402


@pytest.mark.slow
def test_knn_ranking_parity_torch_vs_flax():
    torch.manual_seed(0)
    tm = TorchResNet18().eval()
    with torch.no_grad():
        _randomize_bn_stats(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_resnet(sd, (2, 2, 2, 2))
    fm = build_resnet("resnet18")

    rng = np.random.default_rng(0)
    gallery_imgs = rng.integers(0, 256, (32, 250, 250, 3), dtype=np.uint8)
    query_imgs = rng.integers(0, 256, (6, 250, 250, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, 32)

    def flax_embed(imgs):
        x = knn_transform(jnp.asarray(imgs), 224)
        f = fm.apply({"params": params, "batch_stats": stats}, x,
                     train=False)
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        return np.asarray(f, np.float32)

    def torch_embed(imgs):
        # identical transform math in torch: center crop + /255 + normalize
        top = int(round((250 - 224) / 2.0))
        x = imgs[:, top:top + 224, top:top + 224].astype(np.float32) / 255.0
        x = (x - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225])
        t = torch.tensor(np.transpose(x, (0, 3, 1, 2)), dtype=torch.float32)
        with torch.no_grad():
            f = tm(t).numpy()
        return f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True),
                              1e-12)

    gf_flax, gf_torch = flax_embed(gallery_imgs), torch_embed(gallery_imgs)
    qf_flax, qf_torch = flax_embed(query_imgs), torch_embed(query_imgs)
    np.testing.assert_allclose(gf_flax, gf_torch, rtol=1e-3, atol=2e-4)

    # retrieval ranking identical
    _, idx_flax = GalleryIndex(gf_flax, [str(i) for i in range(32)],
                               normalized=True).search(qf_flax, k=10,
                                                       normalized=True)
    ref_rank = np.argsort(-(qf_torch @ gf_torch.T), axis=1,
                          kind="stable")[:, :10]
    np.testing.assert_array_equal(idx_flax, ref_rank)

    # kNN predictions identical
    preds_flax = knn_predict(gf_flax, labels, qf_flax, k=5, num_classes=4)
    preds_torch = knn_predict(gf_torch, labels, qf_torch, k=5, num_classes=4)
    np.testing.assert_array_equal(preds_flax, preds_torch)
