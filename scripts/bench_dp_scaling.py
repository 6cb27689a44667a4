"""Data-parallel scaling check on the virtual 8-device CPU mesh.

On this 1-core machine 8 virtual devices share one core, so wall-clock
cannot drop 8x; what CAN be measured is SPMD efficiency: the 8-way sharded
step (global batch 8b) should cost ~8x the single-device step (batch b) —
i.e. per-device overhead ~0 — which on real 8-chip hardware is ~8x
step-throughput scaling. Prints one JSON line with the efficiency ratio
t_1dev*8 / t_8dev (1.0 = perfect).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=.:$HOME/.axon_site python scripts/bench_dp_scaling.py
"""

import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig  # noqa: E402
from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval  # noqa: E402
from efficientvlm_tpu.pruning.l0_module import XVLML0Module  # noqa: E402
from efficientvlm_tpu.train.optim import (  # noqa: E402
    create_l0_optimizer,
    create_lagrangian_optimizer,
    create_optimizer,
)
from efficientvlm_tpu.train.steps import init_train_state, make_retrieval_train_step  # noqa: E402


def build(axis_name):
    vcfg = VisionConfig.create(
        vision_width=64, num_attention_heads=4, intermediate_size=128,
        num_hidden_layers=2, image_res=32, patch_size=8,
    )
    tcfg = TextConfig.create(
        vocab_size=500, hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=128, encoder_width=64, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    student = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 32}))
    teacher = XVLMForRetrieval(vcfg, tcfg, Config({"embed_dim": 32}))
    sparams = student.init(jax.random.PRNGKey(0))
    tparams = teacher.init(jax.random.PRNGKey(1))
    l0 = XVLML0Module(
        vision_layers=2, text_layers=2, cross_layers=2,
        hidden_size=64, intermediate_size=128, num_heads=4,
        vision_hidden_size=64, vision_intermediate_size=128, vision_num_heads=4,
        target_sparsity=0.25, lagrangian_warmup=10,
    )
    l0_params = l0.init(jax.random.PRNGKey(2))
    opts = (
        create_optimizer(sparams, lr=1e-4, weight_decay=0.01, grad_clip=1.0),
        create_l0_optimizer(reg_lr=0.01),
        create_lagrangian_optimizer(reg_lr=0.01),
    )
    state = init_train_state(sparams, l0_params, opts)
    step = make_retrieval_train_step(
        student, teacher, l0, opts, teacher_params=tparams, axis_name=axis_name,
    )
    return step, state


def batch_of(n):
    return {
        "image": jnp.zeros((n, 32, 32, 3), jnp.float32),
        "text_ids": jnp.ones((n, 16), jnp.int32),
        "text_atts": jnp.ones((n, 16), jnp.int32),
        "idx": jnp.arange(n),
    }


def timeit(fn, state, batch, iters=20):
    state, m = fn(state, batch, jax.random.PRNGKey(3))
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = fn(state, batch, jax.random.PRNGKey(4 + i))
    np.asarray(m["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    per_dev = 8
    n = len(jax.devices())
    assert n >= 8, jax.devices()

    step1, state1 = build(None)
    t1 = timeit(jax.jit(step1), state1, batch_of(per_dev))

    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    step8, state8 = build("data")
    fn8 = jax.jit(shard_map(
        step8, mesh=mesh, in_specs=(P(), P("data"), P()), out_specs=(P(), P()),
        check_vma=False,
    ))
    t8 = timeit(fn8, state8, batch_of(per_dev * 8))

    cost_growth = t8 / t1
    print(json.dumps({
        "metric": "dp8_step_cost_growth_for_8x_data_virtual_cpu",
        "value": round(cost_growth, 3),
        "t_1dev_batch8_ms": round(t1 * 1e3, 2),
        "t_8dev_batch64_ms": round(t8 * 1e3, 2),
        "note": "8x the global batch over the 8-way sharded step costs this "
                "multiple of the single-device step on a 1-core host (all "
                "virtual devices share the core); ~1.0 means the sharded "
                "program itself adds no cost => ~8x throughput on 8 real chips",
    }))


if __name__ == "__main__":
    main()
