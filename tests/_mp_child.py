"""Child process for tests/test_multiprocess.py — one rank of a 2-process
`jax.distributed` CPU job (the executed counterpart of the reference's
`init_distributed_mode`, `/root/reference/src/util/misc.py:221-277`).

Usage: python _mp_child.py <coordinator> <pid> <csv> <img_dir> <out_json>
Rank 0 writes {"psum": ..., "loss": ..., "upd_l2": ...} to out_json.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coord, pid, csv, img_dir, out_json = sys.argv[1:6]
    pid = int(pid)
    # exactly ONE local device per process (strip any inherited virtual
    # device-count flag); CPU platform must be pinned via jax.config because
    # sitecustomize sets JAX_PLATFORMS=axon at interpreter start
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = flags.strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from hairci.parallel.collectives import init_distributed

    init_distributed(coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.local_device_count() == 1

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hairci.data import load_manifest
    from hairci.data.grain_loader import GrainLoader
    from hairci.parallel import create_mesh

    mesh = create_mesh(n_data=2, n_model=1)  # both processes' devices

    # --- 1. one cross-process collective ---------------------------------
    local = np.full((4,), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local)
    psum = float(jax.jit(jnp.sum)(garr))

    # --- 2. sharded SimCLR step over per-process GrainLoader shards ------
    from hairci.aug.pipelines import simclr_transform
    from hairci.ssl import build_recipe

    manifest = load_manifest(csv, img_dir)
    loader = GrainLoader(manifest, batch_size=4, size=32, mode="raw_resize",
                         shuffle=False, drop_last=True, seed=0,
                         num_workers=0, shard_index=pid, shard_count=2)
    images_local, _ = next(iter(loader))

    recipe = build_recipe("simclr", backbone="resnet18", img_size=32,
                          transform=simclr_transform(32), dtype=jnp.float32)
    state = recipe.create_state(
        jax.random.key(0), jnp.zeros((4, 32, 32, 3), jnp.uint8))

    def replicate(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, P()), lambda idx: x[idx])

    state = jax.tree_util.tree_map(replicate, state)
    batch = {"image": jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None, None, None)),
        np.asarray(images_local))}
    new_state, metrics = jax.jit(recipe.train_step)(
        state, batch, jax.random.key(7))
    loss = float(metrics["loss"])
    upd_sq = sum(
        float(np.vdot(np.asarray(a) - np.asarray(b),
                      np.asarray(a) - np.asarray(b)).real)
        for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                        jax.tree_util.tree_leaves(state.params)))

    if pid == 0:
        with open(out_json, "w") as f:
            json.dump({"psum": psum, "loss": loss,
                       "upd_l2": float(np.sqrt(upd_sq))}, f)


if __name__ == "__main__":
    main()
