import json
import os

import numpy as np
import pytest
from PIL import Image

from hairci.data import DataLoader, load_manifest
from hairci.train import checkpoint as ckpt_lib
from hairci.train.engine import Trainer, run_name


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """Tiny synthetic hair-crop dataset + CSV manifest."""
    root = tmp_path_factory.mktemp("data")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = ["id,class"]
    for i in range(12):
        arr = np.zeros((60, 50, 3), dtype=np.uint8)
        arr[10:40, 10:40] = rng.integers(50, 255, (30, 30, 3))
        name = f"{i:06d}_hair.png"
        Image.fromarray(arr).save(img_dir / name)
        rows.append(f"{name},{i % 3}")
    csv = root / "data_train.csv"
    csv.write_text("\n".join(rows) + "\n")
    return str(csv), str(img_dir)


def test_manifest_and_loader(dataset_dir):
    csv, img_dir = dataset_dir
    m = load_manifest(csv, img_dir)
    assert len(m) == 12 and m.num_classes == 3
    loader = DataLoader(m, batch_size=4, size=48, shuffle=True,
                        drop_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    for images, labels in batches:
        assert images.shape == (4, 48, 48, 3) and images.dtype == np.uint8
        assert labels.shape == (4,)


def test_loader_skips_corrupt_images(dataset_dir, tmp_path):
    csv, img_dir = dataset_dir
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    manifest = load_manifest(csv, img_dir)
    manifest.paths[0] = str(bad)  # corrupt one entry
    loader = DataLoader(manifest, batch_size=4, size=32, shuffle=False,
                        drop_last=False, num_workers=2)
    batches = list(loader)
    # still yields full-shaped batches (pad-repair), no crash
    assert all(b[0].shape[0] == b[1].shape[0] for b in batches)
    assert sum(b[0].shape[0] for b in batches) == 12


def test_loader_epoch_reshuffles(dataset_dir):
    csv, img_dir = dataset_dir
    m = load_manifest(csv, img_dir)
    loader = DataLoader(m, batch_size=12, size=16, shuffle=True, seed=1,
                        num_workers=2)
    l1 = next(iter(loader))[1]
    l2 = next(iter(loader))[1]
    assert not np.array_equal(l1, l2)  # epoch advanced → new order


def _args(tmp_path, csv, img_dir, **over):
    import argparse

    ns = argparse.Namespace(
        epochs=3, batch_size=4, save_path=str(tmp_path / "out"), size=32,
        train_annotation=csv, img_dir=img_dir, lr=1e-3, weight_decay=0.0,
        beta1=0.9, beta2=0.999, temp=0.5, mode="SHAM", model="resnet18",
        seed=0, num_workers=2, warm_up_epochs=2, ema=0.99, k=3,
        ablation="None", continue_training=False, checkpoint_folder=None,
        dtype="float32",
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


@pytest.mark.slow
def test_sham_end_to_end_training(dataset_dir, tmp_path):
    from hairci.aug.pipelines import simclr_transform
    from hairci.ssl import build_recipe

    csv, img_dir = dataset_dir
    args = _args(tmp_path, csv, img_dir)
    m = load_manifest(csv, img_dir)
    loader = DataLoader(m, batch_size=4, size=40, shuffle=True,
                        drop_last=True, seed=0, num_workers=2)
    import jax.numpy as jnp

    recipe = build_recipe(
        "SHAM", backbone="resnet18", img_size=32,
        transform=simclr_transform(32), num_batches=len(loader),
        warm_up_epochs=2, dtype=jnp.float32)
    trainer = Trainer(recipe, loader, args, checkpoint_every=2)
    state = trainer.train()
    # epochs 0 (warmup), 1 (mine), 2 (mined) all ran
    run_dir = trainer.save_path
    log = open(os.path.join(run_dir, "training_log.txt")).read()
    assert log.count("Epoch") == 3
    metrics = [json.loads(l) for l in
               open(os.path.join(run_dir, "metrics.jsonl"))]
    assert len(metrics) == 3
    assert all(np.isfinite(mm["loss"]) for mm in metrics)
    # checkpoints: periodic at epoch 2 (1-based) + latest
    assert os.path.isdir(os.path.join(run_dir, "model_ckpt_2"))
    assert os.path.isdir(os.path.join(run_dir, "model_ckpt_latest"))
    # mined indices are in the checkpointed state (resume-gap fix)
    assert state.neg_indices is not None

    # resume from latest and continue 1 more epoch
    args2 = _args(tmp_path, csv, img_dir, epochs=4, continue_training=True,
                  checkpoint_folder=run_dir)
    loader2 = DataLoader(m, batch_size=4, size=40, shuffle=True,
                         drop_last=True, seed=0, num_workers=2)
    trainer2 = Trainer(recipe, loader2, args2, checkpoint_every=10)
    trainer2.create_or_restore_state(
        np.zeros((4, 40, 40, 3), dtype=np.uint8))
    assert trainer2.start_epoch == 3


def test_run_name_encodes_config(tmp_path, dataset_dir):
    csv, img_dir = dataset_dir
    args = _args(tmp_path, csv, img_dir)
    name = run_name(args)
    assert "SHAM" in name and "ep3" in name and "k3" in name


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from hairci.aug.pipelines import simclr_transform
    from hairci.ssl import build_recipe

    recipe = build_recipe("simclr", backbone="resnet18", img_size=32,
                          transform=simclr_transform(32), dtype=jnp.float32)
    imgs = jnp.zeros((2, 40, 40, 3), jnp.uint8)
    state = recipe.create_state(jax.random.key(0), imgs)
    path = ckpt_lib.save_checkpoint(str(tmp_path), "model_ckpt_latest",
                                    state, epoch=7)
    state2 = recipe.create_state(jax.random.key(1), imgs)
    restored, epoch = ckpt_lib.restore_checkpoint(path, state2)
    assert epoch == 7
    l0 = jax.tree_util.tree_leaves(state.params)
    l1 = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(l0, l1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt_lib.get_latest_checkpoint(str(tmp_path)) == path


def test_grain_loader(dataset_dir):
    pytest.importorskip("grain")
    from hairci.data.grain_loader import GrainLoader
    from hairci.data import load_manifest

    csv, img_dir = dataset_dir
    m = load_manifest(csv, img_dir)
    loader = GrainLoader(m, batch_size=4, size=32, num_workers=0,
                         drop_last=True)
    batches = list(loader)
    assert len(batches) == 3
    for images, labels in batches:
        assert images.shape == (4, 32, 32, 3) and images.dtype == np.uint8
        assert labels.shape == (4,)
    # epoch advance reshuffles
    l1 = np.concatenate([b[1] for b in batches])
    l2 = np.concatenate([b[1] for b in list(loader)])
    assert not np.array_equal(l1, l2)
    # multi-host sharding splits the data
    s0 = GrainLoader(m, batch_size=2, size=32, num_workers=0,
                     shard_index=0, shard_count=2)
    s1 = GrainLoader(m, batch_size=2, size=32, num_workers=0,
                     shard_index=1, shard_count=2)
    n0 = sum(b[0].shape[0] for b in s0)
    n1 = sum(b[0].shape[0] for b in s1)
    assert n0 == n1 == 6


def test_supcon_trainer_passes_labels(dataset_dir, tmp_path):
    """The engine must put labels in the batch dict — SupCon's train_step
    consumes batch['label'] (regression: KeyError when the Trainer only
    shipped images)."""
    from hairci.aug.pipelines import supcon_train_transform
    from hairci.ssl import build_recipe
    import jax.numpy as jnp

    csv, img_dir = dataset_dir
    args = _args(tmp_path, csv, img_dir, mode="simclr_supcon", epochs=1)
    m = load_manifest(csv, img_dir)
    loader = DataLoader(m, batch_size=4, size=40, shuffle=True,
                        drop_last=True, seed=0, num_workers=2)
    recipe = build_recipe("simclr_supcon", backbone="resnet18", img_size=32,
                          transform=supcon_train_transform(32),
                          dtype=jnp.float32)
    trainer = Trainer(recipe, loader, args)
    trainer.train()
    metrics = [json.loads(l) for l in
               open(os.path.join(trainer.save_path, "metrics.jsonl"))]
    assert metrics and np.isfinite(metrics[0]["loss"])
