"""KD train-step time on real hardware (BASELINE's 'KD step time' metric):
one jitted stage-2 retrieval pruning step (student fwd w/ stochastic gates +
teacher fwd + full KD menu + Lagrangian + 3 optimizer updates) at 224px.

Usage: PYTHONPATH=.:$HOME/.axon_site python scripts/bench_kd_step.py [batch]
Prints one JSON line per phase (fwd-only eval step and full train step).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from efficientvlm_tpu.config import Config, TextConfig, VisionConfig
from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval
from efficientvlm_tpu.pruning.l0_module import XVLML0Module
from efficientvlm_tpu.train.optim import (
    create_l0_optimizer,
    create_lagrangian_optimizer,
    create_optimizer,
)
from efficientvlm_tpu.train.steps import init_train_state, make_split_retrieval_train_step


def main(batch=32, image_res=224):
    vcfg_s = VisionConfig.create(num_hidden_layers=6, image_res=image_res, scan_layers=True)
    tcfg_s = TextConfig.create(num_hidden_layers=6, fusion_layer=3, encoder_width=768,
                               hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                               scan_layers=True)
    vcfg_t = VisionConfig.create(num_hidden_layers=12, image_res=image_res, scan_layers=True)
    tcfg_t = TextConfig.create(num_hidden_layers=12, fusion_layer=6, encoder_width=768,
                               hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                               scan_layers=True)
    student = XVLMForRetrieval(vcfg_s, tcfg_s, Config({"embed_dim": 256}))
    teacher = XVLMForRetrieval(vcfg_t, tcfg_t, Config({"embed_dim": 256}))
    sparams = student.init(jax.random.PRNGKey(0))
    tparams = teacher.init(jax.random.PRNGKey(1))
    l0 = XVLML0Module(vision_layers=6, text_layers=3, cross_layers=3,
                      target_sparsity=0.25, lagrangian_warmup=100)
    l0_params = l0.init(jax.random.PRNGKey(2))
    opts = (
        create_optimizer(sparams, lr=3e-5, weight_decay=0.01, grad_clip=1.0),
        create_l0_optimizer(reg_lr=0.01),
        create_lagrangian_optimizer(reg_lr=0.01),
    )
    state = init_train_state(sparams, l0_params, opts)
    step_fn = make_split_retrieval_train_step(
        student, teacher, l0, opts, teacher_params=tparams, dtype=jnp.bfloat16,
    )
    batch_data = {
        "image": jax.random.normal(jax.random.PRNGKey(3), (batch, image_res, image_res, 3), jnp.bfloat16),
        "text_ids": jax.random.randint(jax.random.PRNGKey(4), (batch, 40), 0, 30522),
        "text_atts": jnp.ones((batch, 40), jnp.int32),
        "idx": jnp.arange(batch),
    }
    state, metrics = step_fn(state, batch_data, jax.random.PRNGKey(5))
    np.asarray(metrics["loss"])  # host-fetch sync
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, batch_data, jax.random.PRNGKey(6 + i))
    np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "kd_train_step_time",
        "value": round(dt * 1e3, 2),
        "unit": "ms",
        "batch": batch,
        "image_res": image_res,
        "pairs_per_sec": round(batch / dt, 1),
        "loss": float(metrics["loss"]),
    }))


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 32)
