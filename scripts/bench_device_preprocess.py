"""On-chip cost of the in-graph image preprocessing (data/device_pipeline):
preprocess_train (random-resized-crop + hflip + RandAugment(2,7) + CLIP
normalize, per-sample lax.switch) and preprocess_eval (bicubic resize +
normalize), at GD shapes — decides whether SURVEY §2.8's third kernel
target (a Pallas preprocessing kernel) can pay. The number to beat is the
KD step it runs alongside (~57 ms at b16/224px): if augmentation costs a
few ms it is already hidden behind the step and a custom kernel buys
nothing measurable.

  PYTHONPATH=.:/root/.axon_site python scripts/bench_device_preprocess.py
Prints one JSON line. Chains iterations on-device (tunnel timing gotcha:
naive per-dispatch timing is fetch-dominated — see bench_int8_probe).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from efficientvlm_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from efficientvlm_tpu.data.device_pipeline import preprocess_eval, preprocess_train


def timeit(fn, *args, iters=10, warmup=3):
    # shared tunnel-safe timing recipe (train/profiler.py); ms per call
    from efficientvlm_tpu.train.profiler import median_time

    return median_time(fn, args, iters=iters, warmups=warmup) * 1e3


def main(batch=16, src=258, out_res=224):
    rng = np.random.RandomState(0)
    u8 = jnp.asarray(rng.randint(0, 256, (batch, src, src, 3)), jnp.uint8)

    @jax.jit
    def train_pp(key, pix):
        # sum -> scalar fetch; the full output stays on device as it would
        # feeding a train step
        return jnp.sum(preprocess_train(key, pix, out_res))

    @jax.jit
    def eval_pp(pix):
        return jnp.sum(preprocess_eval(pix, out_res))

    key = jax.random.PRNGKey(0)
    t_train = timeit(train_pp, key, u8)
    t_eval = timeit(eval_pp, u8)
    print(json.dumps({
        "metric": "device_preprocess_ms",
        "batch": batch, "src": src, "out_res": out_res,
        "train_ms": round(t_train, 3),
        "eval_ms": round(t_eval, 3),
        "imgs_per_sec_train": round(batch / (t_train / 1e3), 1),
    }))


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 16)
