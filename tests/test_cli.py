"""run.py CLI surface: task routing, reference flag mappings. Drivers are
monkeypatched — these tests pin the LAUNCHER contract, not training."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import run as run_cli


@pytest.fixture
def capture(monkeypatch):
    calls = {}

    def fake(name):
        def main(args, config):
            calls["driver"] = name
            calls["args"] = args
            calls["config"] = config
            return {"ok": True}
        return main

    import efficientvlm_tpu.drivers.captioning as capt
    import efficientvlm_tpu.drivers.gd as gd
    import efficientvlm_tpu.drivers.grounding as grounding
    import efficientvlm_tpu.drivers.nlvr as nlvr
    import efficientvlm_tpu.drivers.retrieval as retrieval
    import efficientvlm_tpu.drivers.vqa as vqa

    for mod, name in ((gd, "gd"), (retrieval, "retrieval"), (vqa, "vqa"),
                      (nlvr, "nlvr"), (capt, "captioning"), (grounding, "grounding")):
        monkeypatch.setattr(mod, "main", fake(name))
    return calls


TASK_TO_DRIVER = {
    "gd_4m_small": "gd",
    "pretrain_4m_base": "gd",
    "pretrain_4m_small": "gd",
    "itr_coco": "retrieval",
    "vqa_480": "vqa",
    "nlvr": "nlvr",
    "nlvr_domain": "nlvr",
    "coco_captioning": "captioning",
    "coco_capt_domain": "captioning",
    "grounding": "grounding",
}


def test_every_task_routes(capture, tmp_path):
    for task, driver in TASK_TO_DRIVER.items():
        out = run_cli.main(["--task", task, "--config", "configs/tests/Retrieval_synth.yaml",
                            "--output_dir", str(tmp_path)])
        assert out == {"ok": True}
        assert capture["driver"] == driver, task
        assert capture["args"]["task"] == task


def test_load_ckpt_from_maps_to_domain_flags(capture, tmp_path):
    run_cli.main(["--task", "nlvr", "--config", "configs/tests/Retrieval_synth.yaml",
                  "--output_dir", str(tmp_path), "--load_ckpt_from", "/x/domain.th"])
    assert capture["args"]["checkpoint"] == "/x/domain.th"
    assert capture["args"]["load_nlvr_pretrain"] is True

    run_cli.main(["--task", "coco_captioning", "--config", "configs/tests/Retrieval_synth.yaml",
                  "--output_dir", str(tmp_path), "--load_ckpt_from", "/x/domain.th"])
    assert capture["args"]["checkpoint"] == "/x/domain.th"
    assert capture["args"]["load_capt_pretrain"] is True


def test_reference_compat_flags_accepted(capture, tmp_path):
    out = run_cli.main(["--task", "itr_coco", "--dist", "f4",
                        "--config", "configs/tests/Retrieval_synth.yaml",
                        "--output_dir", str(tmp_path),
                        "--output_hdfs", "hdfs://x/y",
                        "--student_chkpt", "/x/s.ckpt", "--bs", "12"])
    assert out == {"ok": True}
    assert capture["args"]["output_hdfs"] == "hdfs://x/y"
    assert capture["args"]["student_chkpt"] == "/x/s.ckpt"
    assert capture["config"]["batch_size_train"] == 12


def test_cli_overrides(capture, tmp_path):
    run_cli.main(["--task", "itr_coco", "--config", "configs/tests/Retrieval_synth.yaml",
                  "--output_dir", str(tmp_path), "--sparsity", "0.35", "--epoch", "7"])
    assert capture["config"]["sparsity"] == 0.35
    assert capture["config"]["schedular"]["epochs"] == 7
