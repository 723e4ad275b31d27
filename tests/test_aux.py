"""Coverage for auxiliary subsystems: profiling timer, shard_map
collectives, schedules, visualizer qualitative grid, retrieval CLI
visualization path."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_step_timer():
    from hairci.utils.profiling import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            time.sleep(0.005)
    assert 0.004 < t.mean < 0.1
    assert 0.004 < t.p50 < 0.1


def test_collectives_in_shard_map():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from hairci.parallel import create_mesh
    from hairci.parallel.collectives import all_gather, all_reduce_mean

    mesh = create_mesh()
    x = jnp.arange(16, dtype=jnp.float32).reshape(8, 2)

    def f(xs):
        g = all_gather(xs)           # (8, 2) on every shard
        m = all_reduce_mean(jnp.sum(xs))
        return g, m

    g, m = jax.jit(shard_map(
        f, mesh=mesh, in_specs=P("data", None),
        out_specs=(P(), P()), check_vma=False))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(x))
    assert float(m) == pytest.approx(float(jnp.sum(x)) / 8)


def test_schedules():
    from hairci.train.schedules import (
        cosine_schedule,
        linear_increase_alpha,
        linear_warmup_schedule,
        margin_decay,
    )

    assert cosine_schedule(0, 100, 0.996, 1.0) == pytest.approx(0.996)
    assert cosine_schedule(99, 100, 0.996, 1.0) == pytest.approx(1.0)
    mid = cosine_schedule(50, 100, 0.0, 1.0)
    assert 0.4 < mid < 0.6
    assert linear_warmup_schedule(0, 10, 0.04, 0.07) == pytest.approx(0.04)
    assert linear_warmup_schedule(10, 10, 0.04, 0.07) == pytest.approx(0.07)
    assert margin_decay(0, 10) == pytest.approx(0.7)
    assert margin_decay(9, 10) == pytest.approx(0.5)
    assert linear_increase_alpha(9, 10) == pytest.approx(1.0)


def test_retrieval_cli_visualization(tmp_path):
    """--save_visualization path of the retrieval CLI produces grids."""
    from PIL import Image

    from hairci.cli.retrieval import _visualize
    from hairci.retrieval.index import GalleryIndex

    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        p = tmp_path / f"g{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    emb = rng.normal(size=(6, 8)).astype(np.float32)
    index = GalleryIndex(emb, paths)
    lut = dict(zip(paths, emb / np.linalg.norm(emb, axis=1, keepdims=True)))

    class FakeEncoder:
        def encode_single_image(self, p):
            return lut[p]

        def retrieve_similar_images(self, feat, idx, top_k):
            scores, ps = idx.search_paths(np.asarray(feat)[None], top_k)
            return ps[0], scores[0]

    import argparse

    args = argparse.Namespace(random_seed=0, num_queries=2, top_k=3,
                              vis_save_dir=str(tmp_path / "vis"))
    _visualize(index, FakeEncoder(), args)
    outs = os.listdir(tmp_path / "vis")
    assert len(outs) == 2 and all(o.endswith(".png") for o in outs)


def test_label_indices_contiguous():
    """Manifest maps arbitrary raw class ids to contiguous [0, C)."""
    import pandas as pd

    from hairci.data.manifest import load_manifest

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        csv = os.path.join(d, "m.csv")
        pd.DataFrame({"id": ["a.png", "b.png", "c.png"],
                      "class": [10, 500, 10]}).to_csv(csv, index=False)
        m = load_manifest(csv, d)
        assert m.num_classes == 2
        np.testing.assert_array_equal(m.label_indices, [0, 1, 0])
        assert m.class_names == [10, 500]


def test_docs_paths_resolve():
    """PARITY.md / MIGRATION.md / README.md claims can't rot: every file,
    symbol, and line citation they make must resolve (tools/check_parity_paths)."""
    from tools.check_parity_paths import main

    assert main() == 0
