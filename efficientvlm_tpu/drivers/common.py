"""Shared driver plumbing: config merge, seeding, output dirs, model builds.

Mirrors what every reference driver main() repeats (e.g.
Eff_Retrieval.py:382-551): seed, distributed init, dataset/loader build,
student+teacher build, optimizer trio, log file handling.
"""

from __future__ import annotations

import json
import os
import signal
import threading
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, TextConfig, VisionConfig, load_task_config
from ..data.tokenizer import build_tokenizer
from ..train import checkpoint as ckpt_io
from ..train.optim import (
    create_l0_optimizer,
    create_lagrangian_optimizer,
    create_optimizer,
)
from ..train.scheduler import create_scheduler
from ..utils.dist import get_rank, get_world_size, init_distributed_mode


def setup(args: Config, config: Config) -> Config:
    global _CKPT_BACKEND
    info = init_distributed_mode()
    np.random.seed(int(args.get("seed", 42)) + info["rank"])
    _CKPT_BACKEND = str(config.get("checkpoint_backend", "msgpack"))
    if args.get("output_dir"):
        os.makedirs(args["output_dir"], exist_ok=True)
        if get_rank() == 0:
            with open(os.path.join(args["output_dir"], "config.json"), "w") as f:
                json.dump({"args": args.to_dict(), "config": config.to_dict()}, f, indent=2, default=str)
    return Config(info)


class StepProfiler:
    """jax.profiler trace capture over a window of train steps, driven by
    config: `profile_dir` (path, or true => <output_dir>/trace),
    `profile_start_step` (default 2 — past the compile), and
    `profile_num_steps` (default 3). Upgrade over the reference's ad-hoc
    time.time() probes (SURVEY §5.1): the trace shows per-op device time in
    xprof/tensorboard. Rank 0 only; call tick(out) once per train step."""

    def __init__(self, config: Config, output_dir: str = ""):
        d = config.get("profile_dir")
        if d is True or d == "true":
            d = os.path.join(output_dir or ".", "trace")
        self.dir = d if (d and get_rank() == 0) else None
        self.start = int(config.get("profile_start_step", 2))
        self.num = int(config.get("profile_num_steps", 3))
        self._i = 0
        self._active = False
        self._done = False
        self._last = None  # latest step output, for syncing a cut-short window

    def tick(self, step_out=None) -> None:
        if not self.dir or self._done:
            return
        if self._i == self.start:
            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif self._active and self._i >= self.start + self.num:
            self._stop(step_out)
        if self._active:
            self._last = step_out
        self._i += 1

    def _stop(self, step_out=None) -> None:
        from ..train.profiler import force_sync

        if step_out is None:
            step_out = self._last
        if step_out is not None:
            # the trace must include real execution: on the tunneled backend
            # block_until_ready returns before the device finishes, so sync
            # by host-fetching the step output (train/profiler.force_sync)
            force_sync(step_out)
        jax.profiler.stop_trace()
        self._active = False
        self._done = True
        self._last = None
        print(f"### profiler trace written to {self.dir}")

    def close(self) -> None:
        """Flush at epoch/run end: a window cut short by an epoch boundary
        still syncs and writes what it captured."""
        if self._active:
            self._stop()


def log_stats(stats: dict, output_dir: str, filename: str = "log.txt") -> None:
    """JSON-lines epoch log (reference pattern, Eff_Retrieval.py:518-525)."""
    if get_rank() != 0 or not output_dir:
        return
    with open(os.path.join(output_dir, filename), "a") as f:
        f.write(json.dumps(stats, default=str) + "\n")


def model_configs(config: Config) -> Tuple[VisionConfig, TextConfig]:
    vision = config.get("vision") or VisionConfig.create(image_res=config.get("image_res", 224))
    text = config.get("text") or TextConfig.create(
        num_hidden_layers=config.get("text_num_hidden_layers", 12),
        encoder_width=vision["vision_width"],
    )
    vision, text = VisionConfig(vision), TextConfig(text)
    # students scan their layer stacks too (teacher rationale below): gates
    # ride as scan xs, and the guards fall back to the unrolled loop for
    # region batches, KV-cache decode, and post-export non-uniform shapes
    vision.setdefault("scan_layers", True)
    text.setdefault("scan_layers", True)
    return vision, text


def teacher_configs(config: Config) -> Tuple[VisionConfig, TextConfig]:
    """Teacher = 12L ViT + 12L BERT (GeneralDistill.py:483-490) unless the
    config carries explicit teacher_* sections."""
    tv = config.get("teacher_vision")
    if tv is None:
        tv = VisionConfig.create(
            image_res=config.get("image_res", 224), num_hidden_layers=12, local_attn_depth=4
        )
    tt = config.get("teacher_text")
    if tt is None:
        tt = TextConfig.create(num_hidden_layers=12, encoder_width=tv["vision_width"])
    tv, tt = VisionConfig(tv), TextConfig(tt)
    # teachers are dense and frozen: scan their uniform layer stacks to keep
    # trace/compile time sane (12L unrolled KD graphs take ~25 min to build)
    tv.setdefault("scan_layers", True)
    tt.setdefault("scan_layers", True)
    return tv, tt


def resolve_warmup(num_warmup_steps, accum: int):
    """Warmup for the update-count schedule under gradient accumulation.
    A float < 1 is a FRACTION of total updates (reference scheduler.py) —
    it rescales with the shrunk update count by itself; only absolute step
    counts divide by the accumulation factor. Truncating the fraction
    through int() would silently disable warmup for every shipped
    fine-tune config (num_warmup_steps: 0.1)."""
    if isinstance(num_warmup_steps, float) and num_warmup_steps < 1:
        return num_warmup_steps
    return int(num_warmup_steps) // accum


def build_optimizers(params, config: Config, total_steps: int, *, init_param_paths=()):
    opt_cfg = config.get("optimizer", Config())
    sched_cfg = config.get("schedular", Config())
    # gradient accumulation (reference accelerator GRAD_ACCUMULATE_STEPS,
    # apex accelerator): optax.MultiSteps accumulates k micro-batch grads
    # and applies one real update — the schedule runs in UPDATE counts, so
    # its horizon shrinks by k. The inner AdamW/clip chain is unchanged.
    accum = int(config.get("accelerator", {}).get("GRAD_ACCUMULATE_STEPS", 1) or 1)
    sched = create_scheduler(
        lr=float(opt_cfg.get("lr", 1e-4)),
        num_training_steps=max(total_steps // accum, 1),
        num_warmup_steps=resolve_warmup(sched_cfg.get("num_warmup_steps", 0), accum),
    )
    main = create_optimizer(
        params,
        lr=sched,
        weight_decay=float(opt_cfg.get("weight_decay", 0.01)),
        lr_mult=float(opt_cfg.get("lr_mult", 1.0)),
        init_param_paths=init_param_paths,
        grad_clip=float(config.get("accelerator", {}).get("CLIP_GRAD_NORM", 1.0) or 0) or None,
    )
    reg_lr = float(opt_cfg.get("reg_learning_rate", 0.01))
    l0_opt = create_l0_optimizer(reg_lr=reg_lr)
    lag_opt = create_lagrangian_optimizer(reg_lr=reg_lr)
    skip_bad = int(config.get("skip_nonfinite_updates", 0) or 0)
    if skip_bad:
        import optax

        # reference parity: apex AMP skips the update when the scaled loss
        # overflows (accelerator.py dynamic loss scale). bf16 rarely
        # overflows, so this is opt-in — a NaN/inf grad leaves params AND
        # optimizer moments untouched for that step; after `skip_bad`
        # consecutive bad steps the poison propagates instead of silently
        # stalling forever. ALL THREE optimizers are guarded: a NaN joint
        # loss NaNs the loga/λ grads too, and an unguarded gate optimizer
        # would poison the gates permanently while params kept skipping.
        main = optax.apply_if_finite(main, max_consecutive_errors=skip_bad)
        l0_opt = optax.apply_if_finite(l0_opt, max_consecutive_errors=skip_bad)
        lag_opt = optax.apply_if_finite(lag_opt, max_consecutive_errors=skip_bad)
    if accum > 1:
        import optax

        # all three optimizers accumulate on the SAME cadence so gates/λ
        # never step against a stale set of main-params micro-updates
        main = optax.MultiSteps(main, every_k_schedule=accum)
        l0_opt = optax.MultiSteps(l0_opt, every_k_schedule=accum)
        lag_opt = optax.MultiSteps(lag_opt, every_k_schedule=accum)
    return main, l0_opt, lag_opt


def maybe_load_params(model, args: Config, config: Config, build_fn, **load_kw):
    """Init params; if a checkpoint is given, import it via the torch
    remap path. Raw Swin/DeiT tower checkpoints (config.vision.ckpt,
    reference build_vision_encoder load_params=True) fill the vision
    subtree when an alternative encoder is selected."""
    params = build_fn()
    vision_ckpt = (config.get("vision") or {}).get("ckpt")
    if (vision_ckpt and os.path.exists(vision_ckpt)
            and (config.get("use_swin") or config.get("use_deit"))):
        params["vision"] = ckpt_io.alt_vision_params_from_file(
            vision_ckpt, config, model.vision_cfg)
        print(f"### loaded vision tower from {vision_ckpt}")
    ckpt = args.get("checkpoint") or config.get("checkpoint")
    if ckpt and os.path.exists(ckpt):
        if ckpt.endswith(".ckpt"):
            # Native msgpack tree — incl. physically-pruned exports whose
            # per-layer shapes differ (scripts/export_pruned.py output;
            # reference load_pruned_model, utils/xvlm_utils.py:283-299).
            # The gated apply fns take per-layer param shapes as-is, so a
            # pruned tree needs no model rebuild: --evaluate --checkpoint
            # pruned_student.ckpt serves the sliced (or int8) program.
            params, _ = ckpt_io.extract_model_and_gates(ckpt_io.load_params(ckpt))
            print(f"### loaded native checkpoint from {ckpt}")
            return params
        sd = ckpt_io.load_torch_state_dict(ckpt)
        vcfg, tcfg = model.vision_cfg, model.text_cfg
        params = ckpt_io.xvlm_params_from_state_dict(
            sd,
            vision_layers=vcfg["num_hidden_layers"],
            text_layers=tcfg["num_hidden_layers"],
            fusion_layer=tcfg["fusion_layer"],
            num_patches=vcfg.num_patches,
            **load_kw,
        )
        print(f"### loaded checkpoint from {ckpt}")
    return params


def is_native_checkpoint(args: Config, config: Config) -> bool:
    """True when --checkpoint points at a native msgpack file (any shape:
    physical export, model snapshot, or full training state)."""
    ckpt = args.get("checkpoint") or config.get("checkpoint")
    return bool(ckpt) and str(ckpt).endswith(".ckpt")


def native_eval_gates(l0, args: Config, config: Config):
    """Deterministic eval gates for --evaluate with a native checkpoint.

    A native .ckpt is NOT necessarily a physical export: model snapshots and
    full training states carry TRAINED log-alphas, and the reference
    evaluates those through their deterministic masks. Returns
    l0.forward_deterministic over the stored gates when present, and None
    (dense program) only for gate-free trees — a physically sliced export
    (gates already folded in, reference load_pruned_model) or a pretrain
    state. load_params memoizes the tree, so the read maybe_load_params
    already did is shared, not repeated."""
    ckpt = str(args.get("checkpoint") or config.get("checkpoint"))
    if not os.path.exists(ckpt):
        # mirror maybe_load_params' existence check: a missing path there
        # silently fresh-inits, which would make a FileNotFoundError here
        # point at the wrong cause
        raise SystemExit(f"--checkpoint not found: {ckpt}")
    _, gates = ckpt_io.extract_model_and_gates(ckpt_io.load_params(ckpt))
    # this is the LAST reader of the shared tree: release the memo so a
    # checkpoint-sized host copy is not pinned for the process lifetime
    ckpt_io.clear_load_memo()
    if gates is None:
        return None
    return l0.forward_deterministic({"loga": gates["loga"]})


# ---------------------------------------------------------------------------
# Preemption-safe training. TPU maintenance events / spot eviction deliver
# SIGTERM with a grace window; the reference has no equivalent (an evicted
# DDP job loses everything since the last epoch save). The handler only sets
# a flag — all checkpoint work happens at the next step boundary on the main
# thread, where no collective is in flight.

_PREEMPT = threading.Event()


def install_preemption_handler(extra_signals=()) -> threading.Event:
    """Install the SIGTERM flag-setter (call once, from the launcher).
    Returns the event so tests/embedding code can trigger or inspect it."""
    def _handler(signum, frame):
        _PREEMPT.set()
        print(f"### signal {signum}: preemption flagged — "
              "saving full state at the next step boundary")

    for sig in (signal.SIGTERM, *extra_signals):
        try:
            signal.signal(sig, _handler)
        except (ValueError, OSError):  # non-main thread / unsupported
            pass
    return _PREEMPT


def preempted() -> bool:
    return _PREEMPT.is_set()


def preempted_sync() -> bool:
    """Collectively-agreed preemption flag: with >1 process, signal delivery
    races rank to rank, and acting on a local flag alone would desync the
    ranks' collectives mid-save. Every rank must call this at the same loop
    position (run_train_epoch does, every sync_every batches)."""
    flag = _PREEMPT.is_set()
    if get_world_size() > 1:
        from jax.experimental import multihost_utils

        flag = bool(np.asarray(
            multihost_utils.process_allgather(np.asarray(flag))).any())
    return flag


def run_train_epoch(loader, logger, step_fn, state, rng, make_batch, prof, *,
                    epoch: int, output_dir: str = "", teacher_params=None,
                    resume_batches: int = 0, header: str = "",
                    log_freq: int = 50, sync_every: int = 10):
    """One fine-tune train epoch, shared by all five task drivers:
    items -> make_batch -> step_fn(state, batch, rng, teacher_params),
    with profiler ticks, metric logging, and preemption-safe exit.

    On preemption (install_preemption_handler) the FULL training state is
    saved with {"epoch": epoch-1, "batches_done": i+1} and the process
    exits 0: --resume then replays THIS epoch, fast-forwarding the first
    batches_done batches (the loader re-yields them while the device step
    is skipped and the per-batch rng split is replayed), continuing the
    optimizer/gate state and device rng streams step-exact on the
    epoch-keyed stream. Host-side augmentation replay is exact for
    single-thread loaders and for `device_preprocess` (augmentation is
    in-graph, keyed by the replayed step rng); under a worker-pool loader
    it is best-effort — pool threads share the transform rng, so draw
    order depends on thread scheduling (same caveat as torch DataLoader
    workers in the reference). Single-process checks the flag every batch;
    multi-process agrees collectively every sync_every batches AND once
    after the loop (signal delivery races rank to rank, and short epochs
    must still act before the grace window expires).

    resume_batches: pass extra.get("batches_done") for the first resumed
    epoch, 0 otherwise. Returns the post-epoch state."""
    world = get_world_size()
    # training has started: params live on device now, so any host tree the
    # load memo still pins (multi-GB at real scale) can go
    ckpt_io.clear_load_memo()

    def _save_and_exit(batches_done: int) -> None:
        if pending is not None:
            # the lag-1 fetch still owes the last step's metrics; flush so
            # the preemption log matches the steps actually executed
            logger.update(**{k: float(v) for k, v in pending.items()})
        if output_dir:
            save_full_state(output_dir, state,
                            {"epoch": epoch - 1, "batches_done": batches_done,
                             "preempted": True})
            wait_for_saves()
            log_stats({"preempted": True, "epoch": epoch,
                       "batches_done": batches_done}, output_dir)
        print(f"### preempted at epoch {epoch} batch {batches_done}: "
              "full state saved, exiting cleanly")
        raise SystemExit(0)

    done = 0
    pending = None  # metrics of the PREVIOUS step, still device-async
    for i, items in enumerate(logger.log_every(loader, log_freq, header)):
        if i < resume_batches:
            rng, _ = jax.random.split(rng)
            done = i + 1
            continue
        batch = make_batch(items)
        rng, srng = jax.random.split(rng)
        state, metrics = step_fn(state, batch, srng, teacher_params)
        prof.tick(metrics)
        # one-step-lagged metric fetch: float() blocks on the device, so
        # reading THIS step's metrics here would serialize host batch prep
        # with device compute; reading last step's (already finished while
        # this one was being fed) keeps the loop pipelined
        if pending is not None:
            logger.update(**{k: float(v) for k, v in pending.items()})
        pending = metrics
        done = i + 1
        if (preempted() if world == 1
                else ((i + 1) % sync_every == 0 and preempted_sync())):
            _save_and_exit(done)
    # epochs shorter than sync_every never hit the modulo; one collective
    # check at the epoch boundary bounds the reaction time either way.
    # (_save_and_exit flushes `pending` itself, so this runs first.)
    if world > 1 and preempted_sync():
        _save_and_exit(done)
    if pending is not None:
        logger.update(**{k: float(v) for k, v in pending.items()})
    return state


def save_training_state(output_dir: str, tag, payload: dict) -> None:
    """Write a model snapshot (model_state_{tag}.ckpt). Deliberately does
    NOT touch training_state_latest: that rolling file is save_full_state's
    resumable FULL state ({"state","extra"} incl. all optimizer moments) —
    passing training_states here used to overwrite it with the small
    {model,l0,epoch} payload on best epochs, breaking --resume."""
    if get_rank() != 0 or not output_dir:
        return
    ckpt = ckpt_io.Checkpointer(output_dir)
    ckpt.save_checkpoint(tag, payload)


def data_parallel_step(step_fn, *, fold_rng: bool = True, with_teacher: bool = False):
    """Data-parallel wrap of step_fn(state, batch, rng) -> (state, metrics)
    over ALL local devices — the TPU-native DDP that every reference driver
    gets from torch DDP / Apex (Eff_Retrieval.py:448-450,
    apex_ddp_accelerator.py:79-89). State is replicated, the batch is
    sharded on a 1-axis 'data' mesh, and the step's own pmean (enabled by
    axis_name='data') reduces grads/metrics over ICI.

    The per-shard rng is decorrelated by folding in the axis index, matching
    reference DDP semantics where every rank samples its own dropout /
    hard-negative / gate noise.

    with_teacher=True: the step takes a 4th argument (teacher params,
    replicated). Teacher params MUST travel as an argument — closed-over
    arrays inline into the lowered module as constants, which at production
    size multiplies compile time and overflows the compile service's
    request limit.

    Returns (jitted_fn, mesh, n_devices); with one device this degrades to
    plain jax.jit and mesh=None.

    The mesh spans ALL devices of ALL processes (jax.devices()), matching
    the reference's DDP gradient all-reduce across every rank
    (apex_ddp_accelerator.py:79-89) and its world-batch contrastive
    AllGather (models/xvlm.py:55-75): with jax.distributed initialized,
    grads pmean and the ITC all_gather ride the full 'data' axis, so
    multi-host replicas stay bit-identical. Each process feeds its rank's
    loader shard; place_batch assembles the global batch array.
    """
    devices = jax.devices()
    n = len(devices)
    if n == 1:
        return jax.jit(step_fn), None, 1
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(devices), ("data",))

    if with_teacher:
        def wrapped(state, batch, rng, teacher_params):
            if fold_rng:
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            return step_fn(state, batch, rng, teacher_params)

        in_specs = (P(), P("data"), P(), P())
    else:
        def wrapped(state, batch, rng):
            if fold_rng:
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            return step_fn(state, batch, rng)

        in_specs = (P(), P("data"), P())

    fn = jax.jit(
        shard_map(
            wrapped, mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return fn, mesh, n


def build_train_step(step_factory, config: Config, state, *, with_teacher: bool = True):
    """Build the driver's jitted train step honoring `zero1: true`
    (ZeRO-1 optimizer-state sharding, parallel/zero.py).

    step_factory(axis_name) -> step_fn. With zero1 the step is built
    axis-free (global-batch semantics under pjit; XLA inserts the
    collectives) and the returned STATE is re-placed with sharded moments —
    callers must use the returned state. Otherwise the usual shard_map DP
    wrap applies. Only for drivers whose batches carry NO shard-local
    gather indices (retrieval/NLVR/captioning are flat; GD region batches
    and sharded vqa_collate k_index are LOCAL per shard, so those drivers
    stay on the shard_map path).

    Returns (step_fn, mesh, state)."""
    use_zero1 = bool(config.get("zero1")) and jax.device_count() > 1
    step = step_factory(None if use_zero1 else dp_axis_name())
    if use_zero1:
        from ..parallel.zero import state_shardings, zero1_step

        fn, mesh, _ = zero1_step(step, state, with_teacher=with_teacher)
        state = jax.device_put(state, state_shardings(mesh, state))
    else:
        fn, mesh, _ = data_parallel_step(step, with_teacher=with_teacher)
    return fn, mesh, state


def data_mesh():
    """(Mesh over ALL processes' devices, 'data') or (None, None) on one
    chip — for steps that manage their own shard_map (split KD step)."""
    devices = jax.devices()
    if len(devices) == 1:
        return None, None
    from jax.sharding import Mesh

    return Mesh(np.asarray(devices), ("data",)), "data"


def dp_axis_name() -> Optional[str]:
    """'data' when >1 GLOBAL device (drivers pass it into step factories so
    grads/metrics pmean and the ITC all_gather span the whole mesh — e.g. a
    2-host x 1-chip topology still needs the axis), else None."""
    return "data" if jax.device_count() > 1 else None


def place_batch(batch: dict, mesh) -> dict:
    """Device placement of a host batch, sharded on the data axis.

    Single process: async device_put over local chips. Multi-process: each
    process contributes its rank's loader shard and the global batch array
    is assembled with jax.make_array_from_process_local_data — the global
    leading dim is per-host-batch x process_count, so the train step's
    collectives span every host (the reference's DDP world batch)."""
    if mesh is None:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def maybe_parallel_loader(loader, config: Config, *, num_workers: Optional[int] = None):
    """Wrap a map-style train loader in a worker pool (the DataLoader
    num_workers analogue) when the host has cores to spare.

    Default backend is the THREAD pool: PIL codecs and the native JPEG
    decoder drop the GIL, so decode-heavy loads scale, and threads are safe
    regardless of when the JAX client initialized. `loader_backend: process`
    opts into the forked worker-process pool (scales Python-side numpy
    augmentation too) — but forking after the TPU client is live is a known
    deadlock risk, so it is never the default. Worker pools only help with
    >1 core: on a single-core host the GIL/IPC overhead makes them 20-50%
    SLOWER (scripts/bench_input_pipeline.py).

    Determinism caveat (same as torch DataLoader workers): pool threads
    share the transform's host rng, so the augmentation stream depends on
    thread scheduling and is not bit-replayable run-to-run. For bit-exact
    epoch replay (determinism tests, preemption resume) use num_workers<=1
    or `device_preprocess` (augmentation compiles into the step, keyed by
    the replayed step rng)."""
    n = int(config.get("num_workers", 4) if num_workers is None else num_workers)
    if n > 1 and (os.cpu_count() or 1) > 2 and hasattr(loader, "batch_size"):
        if config.get("loader_backend", "thread") == "process":
            from ..data.prefetch import ProcessMapLoader

            return ProcessMapLoader(loader, num_workers=n,
                                    seed=int(config.get("seed", 42)))
        from ..data.prefetch import ParallelMapLoader

        return ParallelMapLoader(loader, num_workers=n)
    return loader


def eval_transform(config: Config, image_res: int):
    """The eval-protocol transform: exact PIL BICUBIC by default;
    `native_eval_decode: true` opts into the libjpeg DCT-scaled fast path
    (documented approximation — see ImageTransform.test)."""
    from ..data.transforms import ImageTransform

    return ImageTransform.test(
        image_res, native_decode=bool(config.get("native_eval_decode")))


def preprocess_transform(config: Config, *, default=None):
    """When config.device_preprocess is set, return the uint8 host transform
    (decode+resize only) — augmentation/normalize then compile into the
    train step via wrap_step_with_preprocess; else `default` (the usual
    host-side PIL pipeline)."""
    if not config.get("device_preprocess"):
        return default
    from ..data.transforms import ImageTransform

    return ImageTransform.uint8(config.get("image_res", 224))


def wrap_step_with_preprocess(step, config: Config, *, image_keys=("image",),
                              hflip: bool = True, randaug: bool = True):
    """Compile crop/flip/RandAugment/CLIP-normalize into the (sharded) train
    step when device_preprocess is on (BASELINE north star: the host ships
    uint8; the image path lives in the XLA graph). The wrapped step keeps
    the (state, batch, rng, teacher_params) signature."""
    if not config.get("device_preprocess"):
        return step
    from ..data.device_pipeline import preprocess_train

    image_res = int(config.get("image_res", 224))

    def wrapped(state, batch, rng, teacher_params=None):
        prng, srng = jax.random.split(rng)
        batch = dict(batch)
        for i, k in enumerate(image_keys):
            batch[k] = preprocess_train(
                jax.random.fold_in(prng, i), batch[k], image_res,
                hflip=hflip, randaug=randaug,
            )
        return step(state, batch, srng, teacher_params)

    return wrapped


_SAVE_EXECUTOR = None
_PENDING_SAVE = None
# full-state backend: "msgpack" (rank-0 flax msgpack file, default) or
# "orbax" (per-process sharded OCDBT dir — config `checkpoint_backend`,
# applied by setup(); see train/orbax_io.py)
_CKPT_BACKEND = "msgpack"


def wait_for_saves() -> None:
    """Block until any background checkpoint write has landed (call before
    process exit or before reading training_state_latest back)."""
    global _PENDING_SAVE
    if _PENDING_SAVE is not None:
        _PENDING_SAVE.result()
        _PENDING_SAVE = None
    import sys

    orbax_io = sys.modules.get("efficientvlm_tpu.train.orbax_io")
    if orbax_io is not None:  # only if the orbax backend was ever used
        orbax_io.wait()


def save_full_state(output_dir: str, state, extra: dict, *, tag="latest",
                    background: bool = False) -> None:
    """Persist the COMPLETE training state — params, gates, λ, and all three
    optimizer states — plus driver metadata (epoch/step), mirroring the
    reference's saved dict {model, optimizer, lr_scheduler, epoch}
    (GeneralDistill.py:420-426).

    background=True moves the host fetch + msgpack + disk write onto a
    single worker thread so the train loop keeps stepping (the periodic
    mid-epoch saves in drivers/gd.py are the win). Collective gathers
    (the ZeRO-1 moment replication below) always run on the CALLER thread:
    in multi-process SPMD every process must issue collectives in the same
    order, and a background-thread gather racing the next train step's
    dispatch would reorder them across ranks. JAX arrays are immutable and
    no step donates its state, so the deferred fetch reads a consistent
    snapshot. At most one save is in flight — a new one joins the previous
    first (ordering + bounded host memory)."""
    if _CKPT_BACKEND == "orbax":
        # per-process sharded save: EVERY rank participates (collective),
        # shards go to disk as-is — no gather, no rank-0 funnel; ZeRO-1
        # moments stay sharded on disk (train/orbax_io.py)
        if not output_dir:
            return
        from ..train import orbax_io

        orbax_io.save_state_dir(
            os.path.join(output_dir, "training_state_latest.orbax"),
            state, extra, background=background)
        return

    # ZeRO-1 states carry moments sharded across devices/processes: rank 0
    # cannot host-fetch a non-fully-addressable leaf, so replicate such
    # leaves first (a jit identity with replicated out_sharding gathers
    # through the mesh). No-op for ordinary replicated states.
    def _gather(x):
        if getattr(x, "is_fully_addressable", True):
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(x.sharding.mesh, PartitionSpec())
        return jax.jit(lambda a: a, out_shardings=repl)(x)

    state = jax.tree.map(_gather, state)
    if get_rank() != 0 or not output_dir:
        return
    path = os.path.join(output_dir, "training_state_latest.ckpt")

    def _write():
        ckpt_io.save_pytree(path, {"state": jax.device_get(state), "extra": extra})

    if not background:
        wait_for_saves()  # never let a stale async write clobber a sync one
        _write()
        return
    global _SAVE_EXECUTOR, _PENDING_SAVE
    if _SAVE_EXECUTOR is None:
        from concurrent.futures import ThreadPoolExecutor

        _SAVE_EXECUTOR = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt-save")
    wait_for_saves()
    _PENDING_SAVE = _SAVE_EXECUTOR.submit(_write)


def restore_full_state(output_dir: str, template_state):
    """Restore (state, extra) saved by save_full_state, rebuilding optimizer
    pytrees against `template_state`'s structure (GeneralDistill.py:512-520).
    Returns None when no checkpoint exists. Both backends are probed so a
    run can switch `checkpoint_backend` mid-project; when BOTH artifacts
    exist the newer one wins (a stale orbax dir must not shadow later
    msgpack saves, or vice versa)."""
    orbax_dir = os.path.join(output_dir, "training_state_latest.orbax")
    path = os.path.join(output_dir, "training_state_latest.ckpt")
    have_orbax = os.path.isdir(orbax_dir)
    have_msgpack = os.path.exists(path)
    if have_orbax and (not have_msgpack
                       or os.path.getmtime(orbax_dir) >= os.path.getmtime(path)):
        from ..train import orbax_io

        return orbax_io.restore_state_dir(orbax_dir, template_state)
    if not have_msgpack:
        return None
    payload = ckpt_io.load_pytree(path)
    state = ckpt_io.restore_pytree_like(template_state, payload["state"])
    return state, payload.get("extra", {})
