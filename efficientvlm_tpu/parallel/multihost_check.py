"""Multi-host data-parallel certification worker.

Runs the FULL retrieval pruning train step (student fwd with stochastic
gates + teacher fwd + KD + Lagrangian + 3 optimizer updates) through
drivers.common.data_parallel_step under an arbitrary
(num_processes x local_devices) CPU topology, then dumps the final state
leaves. Spawned K times (jax.distributed supports multi-process
single-host), it certifies the reference DDP contract
(apex_ddp_accelerator.py:79-89: gradient all-reduce across EVERY rank;
models/xvlm.py:55-75: world-batch contrastive AllGather): params must come
out bit-identical on every process AND identical to a 1-process run over
the same global devices/batches.

Usage (each process):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python -m efficientvlm_tpu.parallel.multihost_check \
      --process-id 0 --num-processes 2 --coordinator localhost:12345 \
      --steps 3 --out /tmp/dp0.npz
"""

from __future__ import annotations

import argparse


def _tiny_cfgs(nv=2, nt=4):
    from ..config import TextConfig, VisionConfig

    vcfg = VisionConfig.create(
        vision_width=64, num_attention_heads=4, intermediate_size=128,
        num_hidden_layers=nv, image_res=32, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=128, hidden_size=64, num_hidden_layers=nt, num_attention_heads=4,
        intermediate_size=128, encoder_width=64, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    return vcfg, tcfg


def _global_batch(step: int, global_bs: int):
    """Deterministic synthetic world batch — every process derives the SAME
    global arrays and feeds only its rank's rows (the loader contract)."""
    import numpy as np

    rs = np.random.RandomState(1000 + step)
    return {
        "image": rs.rand(global_bs, 32, 32, 3).astype(np.float32),
        "text_ids": rs.randint(4, 128, (global_bs, 8)).astype(np.int32),
        "text_atts": np.ones((global_bs, 8), np.int32),
        "idx": np.arange(global_bs),
    }


def run(steps: int = 3, per_dev_batch: int = 2, out: str | None = None) -> dict:
    """Call only after jax.distributed is initialized (or single-process).
    Returns {leaf_path: np.ndarray} of the final train state."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import Config
    from ..drivers import common
    from ..models.model_retrieval import XVLMForRetrieval
    from ..pruning.l0_module import XVLML0Module
    from ..train.optim import (
        create_l0_optimizer,
        create_lagrangian_optimizer,
        create_optimizer,
    )
    from ..train.steps import init_train_state, make_retrieval_train_step

    rank, world = jax.process_index(), jax.process_count()
    vcfg, tcfg = _tiny_cfgs()
    student = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 32}))
    teacher = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 32}))
    sparams = student.init(jax.random.PRNGKey(0))
    tparams = teacher.init(jax.random.PRNGKey(1))
    l0 = XVLML0Module(
        vision_layers=vcfg["num_hidden_layers"],
        text_layers=tcfg["fusion_layer"],
        cross_layers=tcfg["num_hidden_layers"] - tcfg["fusion_layer"],
        hidden_size=tcfg["hidden_size"], intermediate_size=tcfg["intermediate_size"],
        num_heads=tcfg["num_attention_heads"],
        target_sparsity=0.25, lagrangian_warmup=10,
    )
    l0_params = l0.init(jax.random.PRNGKey(2))
    opts = (
        create_optimizer(sparams, lr=1e-3, weight_decay=0.01, grad_clip=1.0),
        create_l0_optimizer(reg_lr=0.01),
        create_lagrangian_optimizer(reg_lr=0.01),
    )
    state = init_train_state(sparams, l0_params, opts)
    raw_step = make_retrieval_train_step(
        student, teacher, l0, opts, teacher_params=None,
        axis_name=common.dp_axis_name(),
    )
    step_fn, mesh, n_dev = common.data_parallel_step(raw_step, with_teacher=True)

    global_bs = per_dev_batch * jax.device_count()
    local_bs = global_bs // world
    base_rng = jax.random.PRNGKey(7)
    losses = []
    for t in range(steps):
        gb = _global_batch(t, global_bs)
        local = {k: v[rank * local_bs:(rank + 1) * local_bs] for k, v in gb.items()}
        batch = common.place_batch(local, mesh)
        state, metrics = step_fn(state, batch, jax.random.fold_in(base_rng, t), tparams)
        losses.append(float(np.asarray(metrics["loss"])))

    flat = jax.tree_util.tree_flatten_with_path(
        {"params": state.params, "loga": state.loga, "lam": state.lam})[0]
    leaves = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    leaves["__losses__"] = np.asarray(losses)
    if out:
        np.savez(out, **leaves)
    print(f"multihost_check rank={rank}/{world} devices={n_dev} "
          f"steps={steps} final_loss={losses[-1]:.6f}")
    return leaves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--coordinator", default="localhost:12355")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--per-dev-batch", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    # the ambient axon plugin pins jax_platforms at interpreter startup;
    # env JAX_PLATFORMS=cpu alone is ignored (see __graft_entry__)
    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    run(steps=args.steps, per_dev_batch=args.per_dev_batch, out=args.out)


if __name__ == "__main__":
    main()
