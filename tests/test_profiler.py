"""StepProfiler: config-driven jax.profiler trace capture in the drivers.

Upgrade over the reference's ad-hoc time.time() probes (SURVEY §5.1,
ref utils/__init__.py MetricLogger timing): a real device trace over a
window of train steps, viewable in xprof/tensorboard.
"""
import os

import jax
import jax.numpy as jnp

from efficientvlm_tpu.drivers import common
from efficientvlm_tpu.config import Config


def test_step_profiler_writes_trace(tmp_path):
    out = str(tmp_path)
    cfg = Config({"profile_dir": True, "profile_start_step": 1,
                  "profile_num_steps": 2})
    prof = common.StepProfiler(cfg, out)
    assert prof.dir == os.path.join(out, "trace")

    f = jax.jit(lambda x: jnp.sin(x) * 2.0)
    for _ in range(6):
        y = f(jnp.ones((8, 8)))
        prof.tick({"loss": y.sum()})
    prof.close()

    assert prof._done and not prof._active
    # jax writes plugins/profile/<ts>/*.xplane.pb under the trace dir
    found = [p for p, _, fs in os.walk(prof.dir) for n in fs if n.endswith(".xplane.pb")]
    assert found, f"no xplane.pb under {prof.dir}"


def test_step_profiler_disabled_by_default(tmp_path):
    prof = common.StepProfiler(Config({}), str(tmp_path))
    assert prof.dir is None
    for _ in range(5):
        prof.tick()  # no-op, must not raise or create files
    prof.close()
    assert os.listdir(tmp_path) == []


def test_step_profiler_truncated_window_flushes(tmp_path):
    """A window cut short by the epoch boundary still syncs the last step
    output and writes the partial trace (close() flush path)."""
    cfg = Config({"profile_dir": True, "profile_start_step": 1,
                  "profile_num_steps": 100})
    prof = common.StepProfiler(cfg, str(tmp_path))
    f = jax.jit(lambda x: x * 3.0)
    for _ in range(3):  # window opens at step 1 and never completes
        prof.tick({"loss": f(jnp.ones((4,)))})
    assert prof._active
    prof.close()
    assert prof._done and not prof._active
    found = [n for _, _, fs in os.walk(prof.dir) for n in fs if n.endswith(".xplane.pb")]
    assert found, f"truncated window wrote no trace under {prof.dir}"


def test_step_profiler_explicit_dir(tmp_path):
    d = str(tmp_path / "mytrace")
    prof = common.StepProfiler(Config({"profile_dir": d, "profile_start_step": 0,
                                       "profile_num_steps": 1}), "")
    assert prof.dir == d
    prof.tick()
    prof.tick()
    prof.close()
    assert prof._done and os.path.isdir(d)
