"""End-to-end two-stage pipeline smoke on synthetic data (CPU mesh):

  stage 1  general distillation  (run.py --task gd_4m_small)
  stage 2  retrieval pruning fine-tune, initialized from stage 1's student
           (run.py --task itr_coco --checkpoint <stage1>.ckpt)
  export   learned gates -> physically sliced params (scripts/export_pruned.py)
  serve    evaluate the pruned export through the CLI
           (run.py --task itr_coco --evaluate --checkpoint pruned.ckpt)

The reference's full product story (GeneralDistill -> Eff_Retrieval ->
load_model_with_zs export -> load_pruned_model serving) in one command.
Prints one JSON summary line. ~15 min on the 8-device virtual CPU mesh.

  PYTHONPATH=.:$HOME/.axon_site python scripts/e2e_pipeline_synth.py
"""

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    print("### " + " ".join(cmd), flush=True)
    r = subprocess.run([sys.executable] + cmd, cwd=ROOT, env=env,
                       capture_output=True, text=True, timeout=2400, **kw)
    if r.returncode != 0:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"step failed: {cmd}")
    return r.stdout


def main():
    work = tempfile.mkdtemp(prefix="e2e_synth_")
    run(["scripts/make_synth_data.py"])

    # stage 1: general distillation (3 steps on the synthetic stream)
    gd_dir = os.path.join(work, "gd")
    run(["run.py", "--task", "gd_4m_small",
         "--config", "configs/tests/Pretrain_synth.yaml",
         "--output_dir", gd_dir, "--max_steps", "3"])
    student_ckpt = os.path.join(gd_dir, "model_state_step_final.ckpt")
    assert os.path.exists(student_ckpt), student_ckpt

    # stage 2: retrieval pruning fine-tune from the distilled student
    itr_dir = os.path.join(work, "itr")
    run(["run.py", "--task", "itr_coco",
         "--config", "configs/tests/Retrieval_synth.yaml",
         "--checkpoint", student_ckpt, "--output_dir", itr_dir])
    log = [json.loads(l) for l in open(os.path.join(itr_dir, "log.txt"))]
    r_mean = next(l["val_r_mean"] for l in log if "val_r_mean" in l)

    # export: gates -> physically sliced params
    pruned = os.path.join(work, "pruned_student")
    run(["scripts/export_pruned.py",
         "--training_state", os.path.join(itr_dir, "training_state_latest.ckpt"),
         "--task", "itr", "--out", pruned, "--fusion_layer", "2", "--head_dim", "8",
         "--vision_layers", "2", "--text_layers", "2", "--cross_layers", "2",
         "--hidden_size", "32", "--intermediate_size", "64", "--num_heads", "4"])

    # serve: evaluate the pruned export through the CLI
    eval_dir = os.path.join(work, "eval_pruned")
    run(["run.py", "--task", "itr_coco",
         "--config", "configs/tests/Retrieval_synth.yaml",
         "--evaluate", "--checkpoint", pruned + ".ckpt", "--output_dir", eval_dir])
    elog = [json.loads(l) for l in open(os.path.join(eval_dir, "log.txt"))]
    pruned_r_mean = elog[-1]["test"]["r_mean"]

    print(json.dumps({
        "pipeline": "gd -> itr prune -> export -> pruned eval",
        "workdir": work,
        "stage2_val_r_mean": r_mean,
        "pruned_eval_r_mean": pruned_r_mean,
        "ok": True,
    }))


if __name__ == "__main__":
    main()
