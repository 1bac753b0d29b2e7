"""Worker for the 2-process DCN (multi-host) test.

Each process contributes 4 virtual CPU devices (``XLA_FLAGS=
--xla_force_host_platform_device_count=4`` set by the parent) and joins a
2-process ``jax.distributed`` cluster over a localhost coordinator — the
CPU-backend analog of a DCN-connected pod slice (SURVEY.md §2.4
distributed-backend row).  The worker then jits ONE real alternated train
step (surrogate C + generator G + frozen clean model/detector,
train/steps.py) over the 8-device global mesh, with the batch sharded
across both processes and params replicated, and prints the resulting
loss.  Mode "single" runs the identical step in one process (8 local
devices) for the parity assertion.

Usage:  python _multihost_worker.py {single|<proc_id>} <num_procs> <port>
"""

from __future__ import annotations

import sys

import numpy as np


def build_and_step(mesh):
    import jax
    import jax.numpy as jnp

    from combat_tpu.config import Config, apply_dataset_preset
    from combat_tpu.models import get_classifier, get_frequency_detector, get_generator
    from combat_tpu.train import (
        init_frozen,
        init_train_state,
        make_alternated_train_step,
        multistep_lr,
        sgd_torch,
    )
    from combat_tpu.train.mesh import batch_sharding, replicated

    cfg = apply_dataset_preset(Config(dataset="cifar10")).replace(bs=16)
    C = get_classifier(cfg)
    G = get_generator(cfg, "unet")
    F = get_frequency_detector(cfg)
    key = jax.random.key(0)
    sample = jnp.zeros((1, 32, 32, 3))
    txC = sgd_torch(multistep_lr(cfg.lr_C, cfg.schedulerC_milestones, cfg.schedulerC_lambda, 10))
    txG = sgd_torch(multistep_lr(cfg.lr_G, cfg.schedulerG_milestones, cfg.schedulerG_lambda, 10))

    def to_global(sharding):
        # Assemble global arrays from identical per-process host data: works
        # in single- and multi-process mode (each process feeds the shards
        # its local devices own).
        def put(x):
            arr = np.asarray(x)
            return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

        return lambda tree: jax.tree.map(put, tree)

    rep = to_global(replicated(mesh))
    shard = to_global(batch_sharding(mesh))

    stateC = rep(init_train_state(C, key, sample, txC))
    stateG = rep(init_train_state(G, key, sample, txG))
    clean_model = rep(init_frozen(C, key, sample))
    netF = rep(init_frozen(F, key, sample))
    x = shard(np.asarray(jax.random.uniform(key, (cfg.bs, 32, 32, 3), minval=-1.0, maxval=1.0)))
    y = shard(np.asarray(jax.random.randint(key, (cfg.bs,), 0, cfg.num_classes)))

    step = make_alternated_train_step(cfg, C, G)
    with mesh:
        stateC, stateG, metrics = jax.jit(step)(stateC, stateG, clean_model, netF, (x, y), key)
        jax.block_until_ready(metrics)
    return {k: float(v) for k, v in jax.device_get(metrics).items()}


def main() -> None:
    mode, n_proc, port = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    from combat_tpu.cli.common import build_mesh
    from combat_tpu.config import Config, apply_dataset_preset

    if mode == "single":
        cfg = apply_dataset_preset(Config(dataset="cifar10"))
    else:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        cfg = apply_dataset_preset(Config(dataset="cifar10")).replace(
            multihost=True,
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=n_proc,
            process_id=int(mode),
        )
    mesh = build_mesh(cfg)  # multihost mode: calls jax.distributed.initialize
    if mode != "single":
        assert jax.process_count() == n_proc, jax.process_count()
    assert mesh.devices.size == 8, mesh.devices.size
    # Establish the gloo context NOW, while the processes are still aligned
    # from the initialize() rendezvous: the first cross-process collective
    # triggers gloo init with a hard 30 s deadline, and the heavyweight step
    # compile below would drift the workers far past it on a loaded host.
    import numpy as np

    from combat_tpu.train.mesh import batch_sharding

    probe = jax.make_array_from_callback(
        (8,), batch_sharding(mesh), lambda idx: np.ones((8,), np.float32)[idx]
    )
    assert float(jax.jit(lambda a: a.sum())(probe)) == 8.0
    metrics = build_and_step(mesh)
    print(f"MULTIHOST_METRICS loss_ce={metrics['loss_ce']:.6f} sample={metrics['sample']:.1f}")


if __name__ == "__main__":
    main()
