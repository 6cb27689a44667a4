"""Distributed sharded checkpointing via orbax (opt-in backend).

The default full-state path (drivers/common.save_full_state) lowers the
TrainState to a flax state-dict and msgpacks it from rank 0 — simple and
HDFS-capable, but at production scale it funnels every byte through one
host (and ZeRO-1 sharded optimizer moments must be all-gathered first just
to be thrown on disk replicated). `checkpoint_backend: orbax` switches the
rolling full-state file to an orbax OCDBT directory instead:

- every process writes ONLY its addressable shards (no rank-0 funnel, no
  gather — ZeRO-1 moments go to disk sharded and come back sharded);
- restore reapplies the template state's shardings, so a resumed job lands
  its arrays exactly where the step function expects them;
- saves are atomic (tmp dir + rename) and optionally async
  (AsyncCheckpointer overlaps the device→host fetch and write with
  training; `wait()` joins before the next save or a synchronous one).

The model-snapshot files (Checkpointer / save_training_state) stay msgpack:
they are small, params-only, and must stay portable to scripts/infer.py,
export, and torch interop. Reference counterpart: none (torch.save from
rank 0, utils/checkpointer.py:26-49); this is TPU-native infrastructure.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

_ASYNC_CKPTR = None  # one in-flight async save at a time (module-level join)


def _checkpointer(async_: bool):
    import orbax.checkpoint as ocp

    global _ASYNC_CKPTR
    if async_:
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())
        return _ASYNC_CKPTR
    return ocp.Checkpointer(ocp.CompositeCheckpointHandler())


def wait() -> None:
    """Join the in-flight async save, if any."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _jsonable(x):
    if isinstance(x, dict):
        return {str(k): _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (np.integer,)):
        return int(x)
    if isinstance(x, (np.floating,)):
        return float(x)
    if isinstance(x, (np.bool_,)):
        return bool(x)
    return x


def _abstract(sd):
    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if isinstance(x, np.ndarray):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        return x

    return jax.tree.map(leaf, sd)


def save_state_dir(path: str, state, extra: dict, *, background: bool = False) -> None:
    """Write {state, extra} to an orbax directory at `path` (all processes
    call this — the save is collective; each writes its own shards). The
    state is lowered to a flax state-dict first so optax namedtuples
    round-trip structurally, but leaves stay device arrays — no host
    gather happens here."""
    import orbax.checkpoint as ocp
    from flax import serialization

    sd = serialization.to_state_dict(state)
    ckptr = _checkpointer(background)
    wait()  # never overlap two async saves / clobber an in-flight one
    ckptr.save(
        os.path.abspath(path),
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(sd),
            extra=ocp.args.JsonSave(_jsonable(extra)),
        ),
        force=True,
    )
    if not background:
        # sync Checkpointer.save already blocked; nothing to join
        pass


def restore_state_dir(path: str, template_state) -> Optional[Tuple[Any, dict]]:
    """Restore (state, extra) written by save_state_dir, rebuilding the
    template's pytree structure AND its shardings (sharded leaves land
    sharded — the ZeRO-1 resume path never materializes a replicated
    copy). Returns None when no checkpoint directory exists."""
    import orbax.checkpoint as ocp
    from flax import serialization

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    wait()
    sd_template = serialization.to_state_dict(template_state)
    ckptr = _checkpointer(False)
    restored = ckptr.restore(
        path,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(_abstract(sd_template)),
            extra=ocp.args.JsonRestore(),
        ),
    )
    state = serialization.from_state_dict(template_state, restored["state"])
    return state, dict(restored["extra"] or {})
