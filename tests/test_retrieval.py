import json
import os

import numpy as np
import pytest
from PIL import Image

from hairci.eval.retrieval_metrics import (
    load_benchmark,
    recall_map_at_k,
    save_top100_results,
)
from hairci.retrieval.index import GalleryIndex


def test_gallery_index_exact_search(rng):
    emb = rng.normal(size=(100, 16)).astype(np.float32)
    paths = [f"img_{i}.png" for i in range(100)]
    index = GalleryIndex(emb, paths)
    # query = gallery row → top-1 is itself with sim 1
    q = emb[17]
    scores, idx = index.search(q, k=5)
    assert idx[0, 0] == 17
    assert scores[0, 0] == pytest.approx(1.0, abs=1e-5)
    # matches numpy brute force ordering
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    ref = np.argsort(-(en @ (q / np.linalg.norm(q))))[:5]
    np.testing.assert_array_equal(idx[0], ref)


def test_gallery_index_chunked_merge(rng):
    emb = rng.normal(size=(300, 8)).astype(np.float32)
    index_small_chunk = GalleryIndex(emb, [str(i) for i in range(300)],
                                     chunk=64)
    index_one_chunk = GalleryIndex(emb, [str(i) for i in range(300)])
    q = rng.normal(size=(7, 8)).astype(np.float32)
    s1, i1 = index_small_chunk.search(q, k=10)
    s2, i2 = index_one_chunk.search(q, k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_gallery_persistence(tmp_path, rng):
    emb = rng.normal(size=(10, 4)).astype(np.float32)
    index = GalleryIndex(emb, [f"p{i}" for i in range(10)])
    index.save(str(tmp_path))
    assert GalleryIndex.exists(str(tmp_path))
    loaded = GalleryIndex.load(str(tmp_path))
    assert loaded.paths == index.paths
    np.testing.assert_allclose(np.asarray(loaded.embeddings),
                               np.asarray(index.embeddings), rtol=1e-6)


def test_recall_map_exact_values():
    retrieved = [["a", "b", "c", "d"], ["x", "y", "z", "w"]]
    gts = [["b"], ["nope"]]
    r = recall_map_at_k(retrieved, gts, ks=(2, 4))
    # query 1: gt "b" at rank 2 → recall@2 hit, AP@2 = (1/2)/1 = 0.5
    # query 2: no hit
    assert r["Recall"][2] == 0.5
    assert r["mAP"][2] == pytest.approx(0.25)
    assert r["Recall"][4] == 0.5
    assert r["total_queries"] == 2


def test_top100_json_schema(tmp_path):
    out = save_top100_results(
        ["/x/q1_hair.png"], [[f"/db/r{i}_hair.png" for i in range(150)]],
        str(tmp_path / "m_top100_results.json"))
    data = json.load(open(out))
    assert data[0]["query"] == "q1_hair.png"
    assert len(data[0]["top100"]) == 100


def test_load_benchmark_formats(tmp_path):
    p = tmp_path / "b.json"
    p.write_text(json.dumps([
        {"query_image": "a.jpg", "ground_truth": ["b.jpg"]},
        {"query_id": "c.jpg", "ground_truths": ["d.jpg"]},
    ]))
    b = load_benchmark(str(p))
    assert b[0]["query_image"] == "a.jpg"
    assert b[1]["query_image"] == "c.jpg"
    assert b[1]["ground_truth"] == ["d.jpg"]


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("gallery")
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = rng.integers(0, 255, (60, 50, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"{i:03d}_hair.png")
    return str(root)


@pytest.mark.slow
def test_hair_encoder_end_to_end(tmp_path, image_folder):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from hairci.retrieval.encoders import HairEncoder

    enc = HairEncoder(None, "vit_base_patch16", batch_size=6)
    index = enc.extract_dataset_features(image_folder, str(tmp_path / "emb"))
    assert len(index) == 6
    assert os.path.exists(tmp_path / "emb" / "embeddings.npy")
    q = enc.encode_single_image(index.paths[2])
    paths, scores = enc.retrieve_similar_images(q, index, top_k=3)
    assert paths[0] == index.paths[2]  # self-retrieval first
    assert scores[0] == pytest.approx(1.0, abs=1e-3)
    # reload path
    loaded = enc.load_embeddings(str(tmp_path / "emb"))
    assert loaded.paths == index.paths


def test_face_vit_shapes_and_margin_heads():
    import jax
    import jax.numpy as jnp

    from hairci.models.face_vit import ViTFace, sface_loss

    model = ViTFace(image_size=32, patch_size=8, dim=64, depth=2, heads=2,
                    dim_head=16, mlp_dim=128, num_class=10,
                    loss_type="CosFace")
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (2, 64)
    labels = jnp.asarray([1, 3])
    logits, emb2 = model.apply(variables, x, labels)
    assert logits.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), atol=1e-5)
    # margin reduces the target logit vs plain scaled cosine
    plain = ViTFace(image_size=32, patch_size=8, dim=64, depth=2, heads=2,
                    dim_head=16, mlp_dim=128, num_class=10,
                    loss_type="SFace")
    logits_nomargin, _ = plain.apply(variables, x, labels)
    tgt_margin = np.asarray(logits)[np.arange(2), np.asarray(labels)]
    tgt_plain = np.asarray(logits_nomargin)[np.arange(2), np.asarray(labels)]
    assert np.all(tgt_margin < tgt_plain)
    # sface loss finite + differentiable
    cos = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (4, 10)).astype(np.float32))
    g = jax.grad(lambda c: sface_loss(c, jnp.asarray([0, 1, 2, 3])))(cos)
    assert np.isfinite(np.asarray(g)).all()


def test_face_vit_overlapping_patches():
    import jax
    import jax.numpy as jnp

    from hairci.models.face_vit import ViTFace

    model = ViTFace(image_size=32, patch_size=8, dim=64, depth=1, heads=2,
                    dim_head=16, mlp_dim=128, num_class=10, overlapping=True,
                    ac_patch_size=12, pad=4)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (2, 64)


def test_gallery_index_bf16_storage(rng):
    import jax.numpy as jnp

    emb = rng.normal(size=(64, 16)).astype(np.float32)
    f32 = GalleryIndex(emb, [str(i) for i in range(64)])
    b16 = GalleryIndex(emb, [str(i) for i in range(64)],
                       storage_dtype=jnp.bfloat16)
    q = rng.normal(size=(5, 16)).astype(np.float32)
    s1, i1 = f32.search(q, k=3)
    s2, i2 = b16.search(q, k=3)
    np.testing.assert_array_equal(i1[:, 0], i2[:, 0])  # top-1 stable
    np.testing.assert_allclose(s1, s2, atol=0.02)
