import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from hairci.experiments.dualview.data import PairLoader, discover_pairs
from hairci.experiments.dualview.enhanced import (
    MultiScaleHairEncoder,
    PartBasedHairEncoder,
    SpatialAttention,
    hybrid_loss,
)
from hairci.experiments.dualview.losses import (
    MomentumQueue,
    asymmetric_ntxent_loss,
    ntxent_loss_symmetric,
)
from hairci.experiments.dualview.models import (
    DualViewHairModel,
    HairstyleRetrievalModel,
    contrastive_loss,
)


@pytest.fixture(scope="module")
def pair_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pairs")
    rng = np.random.default_rng(0)
    for i in range(8):
        full = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        hair = full.copy()
        hair[:, :32] = 0
        Image.fromarray(full).save(root / f"img{i}.jpg")
        Image.fromarray(hair).save(root / f"img{i}_hair.png")
    return str(root)


def test_discover_pairs(pair_root):
    pairs = discover_pairs(pair_root)
    assert len(pairs) == 8
    assert all(h.endswith("_hair.png") and not f.endswith("_hair.png")
               for f, h in pairs)


def test_pair_loader_batches(pair_root):
    loader = PairLoader(pair_root, batch_size=4, size=32)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["full"].shape == (4, 32, 32, 3)
    assert batches[0]["hair"].shape == (4, 32, 32, 3)


def test_contrastive_loss_diagonal():
    z = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    aligned = float(contrastive_loss(z, z, 0.07))
    rng = np.random.default_rng(1)
    rand = float(contrastive_loss(
        z, jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)), 0.07))
    assert aligned < rand


def test_asymmetric_ntxent_weights():
    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    full_s = float(asymmetric_ntxent_loss(s, t, weight_s2t=1.0))
    full_t = float(asymmetric_ntxent_loss(s, t, weight_s2t=0.0))
    mid = float(asymmetric_ntxent_loss(s, t, weight_s2t=0.5))
    assert abs(mid - 0.5 * (full_s + full_t)) < 1e-5
    assert np.isfinite(float(ntxent_loss_symmetric(s, t)))


def test_dualview_training_and_retrieval(pair_root):
    from hairci.experiments.dualview.train import train

    out = train(pair_root, epochs=2, batch_size=4, size=32,
                loss="infonce", dtype=jnp.float32)
    assert len(out["history"]) == 2
    assert all(np.isfinite(l) for l in out["history"])
    # retrieval wrapper
    model, state = out["model"], out["state"]
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    from hairci.aug import ops

    norm = np.asarray(ops.normalize(ops.to_float(jnp.asarray(imgs))))
    retr = HairstyleRetrievalModel(model, state)
    retr.build_database(norm, [f"p{i}" for i in range(8)])
    scores, paths = retr.retrieve(norm[:2], k=3)
    assert paths[0][0] == "p0"  # self-retrieval


def test_queue_training(pair_root):
    from hairci.experiments.dualview.train import train

    out = train(pair_root, epochs=1, batch_size=4, size=32, loss="queue",
                dtype=jnp.float32)
    assert np.isfinite(out["history"][0])


def test_enhanced_encoders_and_hybrid_loss():
    x = jnp.zeros((2, 64, 64, 3))
    for cls in (MultiScaleHairEncoder, PartBasedHairEncoder):
        enc = cls(backbone_name="resnet18", dtype=jnp.float32)
        variables = enc.init(jax.random.key(0), x, train=False)
        z = enc.apply(variables, x, train=False)
        assert z.shape == (2, 128)
        e = enc.apply(variables, x, train=False, return_embedding=True)
        assert e.shape[0] == 2
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    total, parts = hybrid_loss(s, t)
    assert np.isfinite(float(total))
    assert {"contrastive", "align", "uniform"} <= set(parts)


def test_enhanced_train_save_eval_cli(tmp_path, pair_root):
    """quantitative_eval_enhanced parity: train an enhanced encoder with the
    hybrid loss, save the Orbax checkpoint, evaluate it through the
    quantitative-eval CLI's --model dualview path."""
    import json as _json

    from hairci.experiments.dualview import quantitative_eval, train as dvt

    out = dvt.train(pair_root, epochs=1, batch_size=4, size=32,
                    loss="hybrid", encoder="multiscale",
                    save_path=str(tmp_path / "ckpt"))
    assert np.isfinite(out["history"][0])
    ckpt = str(tmp_path / "ckpt" / "dualview_latest")
    assert os.path.exists(ckpt)

    bench = [{"query_image": f"img{i}.jpg", "ground_truth": [f"img{i}.jpg"]}
             for i in range(2)]
    bench_path = str(tmp_path / "bench.json")
    _json.dump(bench, open(bench_path, "w"))
    out_json = str(tmp_path / "enhanced_results.json")
    quantitative_eval.main([
        "--db_path", pair_root, "--benchmark", bench_path,
        "--ckpt_path", ckpt, "--model", "dualview",
        "--encoder", "multiscale", "--size", "32", "--out", out_json])
    data = _json.load(open(out_json))
    assert len(data) == 2 and all(len(r["top100"]) == 8 for r in data)

    # the query embedding equals the index row built from the same file
    # (random-noise fixtures embed near-identically under pooling, so
    # rank order is not assertable — the plumbing identity is)
    build_index, embed_query = quantitative_eval._dualview_embedder(
        ckpt, "multiscale", 32)
    index = build_index(pair_root)
    row = [os.path.basename(p) for p in index.paths].index("img0_hair.png")
    q = embed_query(os.path.join(pair_root, "img0_hair.png"))
    q = q / np.linalg.norm(q)  # the index stores L2-normalized rows
    np.testing.assert_allclose(q, np.asarray(index.embeddings)[row],
                               rtol=1e-4, atol=1e-5)


def test_quantitative_eval_pipeline(tmp_path, pair_root):
    """End-to-end: build index over hair crops, evaluate a benchmark."""
    from hairci.eval.retrieval_metrics import load_benchmark
    from hairci.experiments.dualview.quantitative_eval import evaluate
    from hairci.retrieval.index import GalleryIndex

    pairs = discover_pairs(pair_root)
    hair_paths = [h for _, h in pairs]
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(len(hair_paths), 16)).astype(np.float32)
    index = GalleryIndex(emb, hair_paths)

    lut = {os.path.basename(p): e for p, e in zip(hair_paths, emb)}

    def embed_query(path):
        return lut[os.path.basename(path)]

    bench = [{"query_image": f"img{i}.jpg", "ground_truth": [f"img{i}.jpg"]}
             for i in range(4)]
    out_json = str(tmp_path / "results.json")
    res = evaluate(index, embed_query, bench, pair_root, ks=(1, 10),
                   out_json=out_json)
    # query embedding == its own gallery row → perfect self-retrieval
    assert res["Recall"][1] == 1.0
    assert res["mAP"][1] == 1.0
    data = json.load(open(out_json))
    assert len(data) == 4 and data[0]["query"].endswith("_hair.png")
