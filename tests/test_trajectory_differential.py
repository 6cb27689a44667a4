"""GRADIENT/OPTIMIZER-STEP trajectory differential vs the reference torch stack.

The forward differentials (test_reference_differential.py) stop at
`torch.no_grad`; this file runs the reference's OWN student
(efficient_models/model_retrieval.py:EffXVLMforRetrieval, with its real
XVLML0Module) and teacher (models/model_retrieval.py:XVLM) at toy geometry
through ONE full Eff_Retrieval.py training step — the KD loss assembly of
Eff_Retrieval.py:113-178, loss.backward(), and the reference's three
optimizers (optim.py:4-69: 4-group AdamW + L0 AdamW + negative-lr Lagrangian
AdamW) — and asserts, against our make_retrieval_train_step on identical
weights / batch / concrete-gate noise / hard-negative indices:

  (i)   every loss component (itc, itm, text/img/cross/logits KD, Lagrangian),
  (ii)  the parameter gradients after one backward (transported into our
        param layout through the same checkpoint remaps — the remaps are pure
        rearrangements, so gradients map exactly like weights),
  (iii) the parameters after ONE optimizer step.

Stochasticity is pinned, not disabled: hard-concrete noise is injected
bit-identically on both sides (L0Module.forward_train(noise=...) /
XVLML0Module.get_eps), and torch.multinomial / XVLM.sample_hard_negatives
are both replaced by argmax over the SAME softmax weight matrices.

Deliberate divergences this test DOCUMENTS (asserted, not papered over):

1. The reference's main AdamW contains the l0 module's loga/λ parameters
   (optim.py:52-65 iterates the full model.named_parameters(); the student
   owns l0_module) — so the reference double-updates every gate each step:
   main AdamW (base lr + weight decay) THEN the L0/Lagrangian AdamWs. We
   treat that as an upstream accident: our gates/λ live outside `params`
   and are updated exactly once. The test asserts loga/λ against the
   dedicated-optimizer-only trajectory.
2. Weight-decay membership (train/optim.py:weight_decay_mask docstring):
   the reference's name-substring filter (optim.py:36-44) decays `temp`,
   `class_embedding`, and the CLIP tower's LayerNorm scales (named ln_*,
   which its no_decay set misses); we exclude every <=1-D leaf. The test
   computes the reference's per-element decay flags by pushing flag-filled
   tensors through the remaps, asserts the disagreement is exactly
   "reference decays, ours doesn't" on such leaves, and checks those leaves
   against the pre-decay value.
"""

import importlib
import importlib.util
import os
import socket
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "efficient_models")),
    reason="reference checkout not available",
)

# toy geometry: both towers share width/heads/intermediate because the
# reference XVLML0Module reads a single geometry from the text config
# (xvlm_l0_module.py:40-47). Text layers must be 6 or 12 (asserted upstream).
HID, HEADS, INTER, VOCAB, MAXPOS = 64, 4, 96, 60, 32
IMG, PATCH = 32, 8
V_T, V_S = 4, 2          # vision layers teacher/student (attn KD needs T%S==0)
T_T, T_S = 12, 6         # text+cross layers teacher/student
BATCH, SEQ = 4, 8
LR, WD, REG_LR = 1e-3, 0.01, 0.02
GLOBAL_STEP, LAG_WARMUP, SPARSITY = 7, 100, 0.25
B1, B2, EPS = 0.9, 0.98, 1e-8


def _mod(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.util.spec_from_loader(name, loader=None)
    return m


def _install_reference_packages():
    """Make `models` and `efficient_models` importable from /root/reference
    with the same stubs test_reference_differential.py uses (timm, utils,
    torchvision), plus the transformers-4.12-era shims."""
    from test_reference_differential import _load_ref, _stub_timm

    _stub_timm()
    um = _mod("utils")
    um.read_json = lambda p: __import__("json").load(open(p))
    sys.modules.setdefault("utils", um)

    tv, tv_ops, tv_boxes = (_mod("torchvision"), _mod("torchvision.ops"),
                            _mod("torchvision.ops.boxes"))
    tv_boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    tv_ops.boxes = tv_boxes
    tv.ops = tv_ops
    for m in (tv, tv_ops, tv_boxes):
        sys.modules.setdefault(m.__name__, m)

    for pkg in ("models", "efficient_models"):
        p = _mod(pkg)
        p.__path__ = [os.path.join(REFERENCE, pkg)]
        sys.modules.setdefault(pkg, p)
    _load_ref("_shim_traj", "clip_vit.py")  # applies the modeling_utils shims

    # the real models/__init__.py re-exports these (it can't run here: the
    # stub package skips it); model_retrieval.py does `from models import ...`
    models_pkg = sys.modules["models"]
    if not hasattr(models_pkg, "XVLMBase"):
        mx = importlib.import_module("models.xvlm")
        models_pkg.XVLMBase = mx.XVLMBase
        models_pkg.build_mlp = mx.build_mlp
        models_pkg.load_pretrained = mx.load_pretrained


def _init_gloo():
    import torch

    if not torch.distributed.is_initialized():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        torch.distributed.init_process_group(
            "gloo", init_method=f"tcp://127.0.0.1:{port}", rank=0, world_size=1)


def _write_configs(tmpdir):
    """Tiny on-disk configs the reference builders read (build_vision_encoder
    reads vision_config json; build_text_encoder / XVLML0Module read
    <text_encoder>/config.json)."""
    import json

    from transformers.models.bert.configuration_bert import BertConfig

    text_dir = os.path.join(tmpdir, "text")
    os.makedirs(text_dir, exist_ok=True)
    BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_attention_heads=HEADS,
        intermediate_size=INTER, max_position_embeddings=MAXPOS,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ).to_json_file(os.path.join(text_dir, "config.json"))

    vision = {}
    for tag, layers in (("teacher", V_T), ("student", V_S)):
        path = os.path.join(tmpdir, f"vision_{tag}.json")
        json.dump({
            "vision_width": HID, "patch_size": PATCH, "hidden_act": "quick_gelu",
            "num_attention_heads": HEADS, "attention_dropout": 0.0,
            "intermediate_size": INTER, "num_hidden_layers": layers,
            "local_attn_depth": 0,
        }, open(path, "w"))
        vision[tag] = path

    def cfg(tag, text_layers):
        return {
            "image_res": IMG, "patch_size": PATCH, "use_clip_vit": True,
            "vision_config": vision[tag], "text_encoder": text_dir,
            "text_num_hidden_layers": text_layers, "embed_dim": 16,
            "temp": 0.07, "sparsity": SPARSITY,
        }

    return cfg("student", T_S), cfg("teacher", T_T)


def _ref_loss(student, teacher, l0_module, img_t, ids_t, atts_t, idx_t):
    """The EXACT KD loss assembly of Eff_Retrieval.py:113-178 (helper fns
    ast-extracted from the file itself; temperature = args default 1.0)."""
    import ast

    import torch
    from torch.nn import KLDivLoss, MSELoss

    src = open(os.path.join(REFERENCE, "Eff_Retrieval.py")).read()
    wanted = [n for n in ast.parse(src).body if isinstance(n, ast.FunctionDef)
              and n.name in ("get_kd_loss", "soft_cross_entropy", "get_cor_teacher")]
    ns = {"torch": torch, "KLDivLoss": KLDivLoss}
    exec(compile(ast.Module(body=wanted, type_ignores=[]), "ref_effret", "exec"), ns)
    get_kd_loss, soft_ce, get_cor = ns["get_kd_loss"], ns["soft_cross_entropy"], ns["get_cor_teacher"]

    student_outputs = student(img_t, ids_t, atts_t, idx=idx_t,
                              output_attentions=True, output_hidden_states=True)
    with torch.no_grad():
        teacher_outputs = teacher(img_t, ids_t, atts_t, idx=idx_t,
                                  output_attentions=True, output_hidden_states=True)

    sh, th = student_outputs["hidden_dict"], teacher_outputs["hidden_dict"]
    sa, ta = student_outputs["attention_dict"], teacher_outputs["attention_dict"]
    sc, tc = (student_outputs["cross_attention_dict"],
              teacher_outputs["cross_attention_dict"])
    mse = MSELoss()
    dev = "cpu"

    t_text_h = get_cor(th["text_hidden_states"], sh["text_hidden_states"])
    t_text_a = get_cor(ta["text_attentions"], sa["text_attentions"], is_attn=True)
    text_hidden_loss = get_kd_loss(sh["text_hidden_states"], t_text_h, False, mse, dev)
    text_attention_loss = get_kd_loss(sa["text_attentions"], t_text_a, True, mse, dev)

    t_img_h = get_cor(th["image_hidden_states"], sh["image_hidden_states"])
    t_img_a = get_cor(ta["image_attentions"], sa["image_attentions"], is_attn=True)
    image_hidden_loss = get_kd_loss(sh["image_hidden_states"], t_img_h, False, mse, dev, is_img=True)
    image_attention_loss = get_kd_loss(sa["image_attentions"], t_img_a, True, mse, dev)

    t_pos_h = get_cor(th["itm_pos_hidden_states"], sh["itm_pos_hidden_states"])
    t_pos_a = get_cor(ta["itm_pos_attentions"], sa["itm_pos_attentions"], is_attn=True)
    t_pos_x = get_cor(tc["itm_pos_cross_attentions"], sc["itm_pos_cross_attentions"], is_attn=True)
    itm_pos_hidden_loss = get_kd_loss(sh["itm_pos_hidden_states"], t_pos_h, False, mse, dev)
    itm_pos_attn_loss = get_kd_loss(sa["itm_pos_attentions"], t_pos_a, True, mse, dev)
    itm_pos_cross_loss = get_kd_loss(sc["itm_pos_cross_attentions"], t_pos_x, True, mse, dev)

    t_neg_h = get_cor(th["itm_neg_hidden_states"], sh["itm_neg_hidden_states"])
    t_neg_a = get_cor(ta["itm_neg_attentions"], sa["itm_neg_attentions"], is_attn=True)
    t_neg_x = get_cor(tc["itm_neg_cross_attentions"], sc["itm_neg_cross_attentions"], is_attn=True)
    itm_neg_hidden_loss = get_kd_loss(sh["itm_neg_hidden_states"], t_neg_h, False, mse, dev)
    itm_neg_attn_loss = get_kd_loss(sa["itm_neg_attentions"], t_neg_a, True, mse, dev)
    itm_neg_cross_loss = get_kd_loss(sc["itm_neg_cross_attentions"], t_neg_x, True, mse, dev)

    itm_logits_loss = soft_ce(student_outputs["logits_dict"]["itm_head_logits"] / 1.0,
                              teacher_outputs["logits_dict"]["itm_head_logits"] / 1.0)

    loss_itc = student_outputs["loss"]["loss_itc"]
    loss_itm = student_outputs["loss"]["loss_itm"]
    loss_text_kd = text_hidden_loss + text_attention_loss
    loss_img_kd = 0.2 * image_hidden_loss + image_attention_loss
    loss_cross_kd = (itm_neg_hidden_loss + itm_pos_hidden_loss + itm_pos_attn_loss
                     + itm_pos_cross_loss + itm_neg_attn_loss + itm_neg_cross_loss) * 0.5
    loss_kd = itm_logits_loss + (loss_text_kd + loss_img_kd + loss_cross_kd) * 0.33
    loss_small = loss_itc + loss_itm
    loss = (loss_kd + loss_small) * 0.5

    lagrangian_loss, expected_sparsity, target_sparsity = (
        l0_module.lagrangian_regularization(GLOBAL_STEP))
    loss = loss + lagrangian_loss

    return loss, {
        "loss_itc": loss_itc, "loss_itm": loss_itm,
        "loss_text_kd": loss_text_kd, "loss_img_kd": loss_img_kd,
        "loss_cross_kd": loss_cross_kd, "loss_itm_logits_kd": itm_logits_loss,
        "loss_kd": loss_kd, "lagrangian_loss": lagrangian_loss,
        "expected_sparsity": expected_sparsity,
    }


def _ref_optimizer_groups(student):
    """Run the reference's OWN create_optimizer / create_L0_optimizer
    (optim.py:4-69, ast-extracted — the module imports the long-removed
    transformers AdamW) with a stub AdamW that records the groups."""
    import ast

    recorded = []

    class StubAdamW:
        def __init__(self, params, lr=None, eps=None, betas=None):
            self.groups = [dict(g) for g in params]
            self.eps, self.betas = eps, betas
            recorded.append(self)

    src = open(os.path.join(REFERENCE, "optim.py")).read()
    wanted = [n for n in ast.parse(src).body if isinstance(n, ast.FunctionDef)
              and n.name in ("create_optimizer", "create_L0_optimizer")]
    ns = {"AdamW": StubAdamW, "print": lambda *a, **k: None}
    exec(compile(ast.Module(body=wanted, type_ignores=[]), "ref_optim", "exec"), ns)

    args = types.SimpleNamespace(lr=LR, weight_decay=WD, lr_mult=1.0,
                                 reg_learning_rate=REG_LR)
    main = ns["create_optimizer"](args, student)
    l0_opt, lag_opt = ns["create_L0_optimizer"](args, student.l0_module)
    assert main.betas == (B1, B2) and main.eps == EPS
    assert l0_opt.betas == (B1, B2) and lag_opt.betas == (B1, B2)
    return main.groups, l0_opt.groups, lag_opt.groups


def _adamw_first_step(groups):
    """Transformers-4.12-era AdamW math (the version the reference pins:
    m/v moments, bias correction via step_size, DECOUPLED weight decay
    applied AFTER the adam update on the updated value), specialized to
    step t=1. Returns {id(param): (p_after_adam, p_after_decay)} numpy."""
    out = {}
    bc1, bc2 = 1.0 - B1, 1.0 - B2
    for g in groups:
        lr, wd = g["lr"], g.get("weight_decay", 0.0)
        for p in g["params"]:
            if p.grad is None:
                continue
            grad = p.grad.detach().cpu().numpy().astype(np.float64)
            pv = p.detach().cpu().numpy().astype(np.float64)
            m = (1 - B1) * grad
            v = (1 - B2) * grad * grad
            step_size = lr * np.sqrt(bc2) / bc1
            p_adam = pv - step_size * m / (np.sqrt(v) + EPS)
            p_final = p_adam - lr * wd * p_adam
            out[id(p)] = (p_adam, p_final)
    return out


@pytest.fixture(scope="module")
def trajectory(tmp_path_factory):
    """Runs BOTH one-step trajectories once; tests assert on the pieces."""
    import torch

    import jax
    import jax.numpy as jnp
    from efficientvlm_tpu.config import TextConfig, VisionConfig
    from efficientvlm_tpu.models.model_retrieval import XVLMForRetrieval
    from efficientvlm_tpu.models.xvlm import XVLM
    from efficientvlm_tpu.pruning.l0_module import L0Module, XVLML0Module
    from efficientvlm_tpu.train import checkpoint as C
    from efficientvlm_tpu.train import steps as S
    from efficientvlm_tpu.train.optim import (
        create_l0_optimizer, create_lagrangian_optimizer, create_optimizer,
        weight_decay_mask,
    )
    from test_reference_differential import _sd_numpy

    _install_reference_packages()
    _init_gloo()
    eff_ret = importlib.import_module("efficient_models.model_retrieval")
    ref_ret = importlib.import_module("models.model_retrieval")

    tmpdir = str(tmp_path_factory.mktemp("traj_cfg"))
    s_cfg, t_cfg = _write_configs(tmpdir)

    torch.manual_seed(0)
    student = eff_ret.EffXVLMforRetrieval(config=s_cfg)
    teacher = ref_ret.XVLM(config=t_cfg)
    student.train()
    teacher.eval()

    # move gates into the active region (head logas init at N(10, .01) —
    # saturated, zero grad); keep values the torch module then owns
    gen = torch.Generator().manual_seed(3)
    for t in student.l0_module.z_logas.values():
        t.data = torch.randn(t.shape, generator=gen) * 1.0 + 0.5
    student.l0_module.lambda_1.data.fill_(0.5)
    student.l0_module.lambda_2.data.fill_(0.3)
    student.l0_module.set_lagrangian_warmup_steps(LAG_WARMUP)

    # ---- pinned stochasticity ----
    rng = np.random.RandomState(11)
    noise = {t: rng.uniform(1e-4, 1 - 1e-4, size=tuple(student.l0_module.z_logas[t].shape)).astype(np.float32)
             for t in student.l0_module.types}
    eps_queue = [torch.from_numpy(noise[t]) for t in student.l0_module.types]
    student.l0_module.get_eps = lambda size: eps_queue.pop(0)

    orig_multinomial = torch.multinomial
    torch.multinomial = lambda w, n: torch.argmax(w).reshape(1)

    def det_sample(self, rng_, image_feat, text_feat, *, idx=None, temp):
        sim_i2t = (image_feat @ text_feat.T).astype(jnp.float32) / temp
        sim_t2i = (text_feat @ image_feat.T).astype(jnp.float32) / temp
        bs = sim_i2t.shape[0]
        if idx is None:
            mask = jnp.eye(bs, dtype=bool)
        else:
            idxc = idx.reshape(-1, 1)
            mask = idxc == idxc.T
        w_i2t = jnp.where(mask, 0.0, jax.nn.softmax(sim_i2t, axis=1) + 1e-5)
        w_t2i = jnp.where(mask, 0.0, jax.nn.softmax(sim_t2i, axis=1) + 1e-5)
        return jnp.argmax(w_t2i, axis=1), jnp.argmax(w_i2t, axis=1)

    orig_sample = XVLM.sample_hard_negatives
    XVLM.sample_hard_negatives = det_sample

    try:
        # ---- batch ----
        img = rng.randn(BATCH, 3, IMG, IMG).astype(np.float32)
        ids = rng.randint(0, VOCAB, (BATCH, SEQ)).astype(np.int64)
        atts = np.ones((BATCH, SEQ), np.int64)
        atts[2, 6:] = 0
        atts[3, 5:] = 0
        idx = np.array([0, 1, 2, 2], np.int64)

        # ---- torch: loss -> backward -> record grads ----
        loss_t, metrics_t = _ref_loss(
            student, teacher, student.l0_module,
            torch.from_numpy(img), torch.from_numpy(ids),
            torch.from_numpy(atts), torch.from_numpy(idx))
        student.zero_grad()
        loss_t.backward()
        named = dict(student.named_parameters())
        grads_t = {n: (p.grad.detach().cpu().numpy() if p.grad is not None
                       else np.zeros(p.shape, np.float32))
                   for n, p in named.items()}

        # ---- torch: the reference's three optimizers, one step ----
        main_groups, l0_groups, lag_groups = _ref_optimizer_groups(student)
        main_step = _adamw_first_step(main_groups)
        l0_step = _adamw_first_step(l0_groups)
        lag_step = _adamw_first_step(lag_groups)

        # per-element reference decay flags, for the remap transport below
        wd_flags = {}
        for g in main_groups:
            for p in g["params"]:
                wd_flags[id(p)] = 1.0 if g.get("weight_decay", 0.0) > 0 else 0.0

        def sd_of(fn):
            """state_dict-shaped dict built from per-PARAMETER fn; buffers
            (position_ids etc.) are taken from the real state dict so the
            remaps see every key they expect."""
            sd = {k: v.detach().cpu().numpy() for k, v in student.state_dict().items()}
            for n, p in named.items():
                sd[n] = fn(n, p)
            return sd

        remap = dict(vision_layers=V_S, text_layers=T_S, fusion_layer=T_S // 2,
                     num_patches=(IMG // PATCH) ** 2, with_mlm_head=False)
        grads_tree = C.xvlm_params_from_state_dict(sd_of(lambda n, p: grads_t[n]), **remap)
        padam_tree = C.xvlm_params_from_state_dict(
            sd_of(lambda n, p: main_step[id(p)][0].astype(np.float32)), **remap)
        pfinal_tree = C.xvlm_params_from_state_dict(
            sd_of(lambda n, p: main_step[id(p)][1].astype(np.float32)), **remap)
        wdflag_tree = C.xvlm_params_from_state_dict(
            sd_of(lambda n, p: np.full(p.shape, wd_flags[id(p)], np.float32)), **remap)

        # ---- ours: identical weights through the remaps ----
        params = C.xvlm_params_from_state_dict(_sd_numpy(student), **remap)
        teacher_params = C.xvlm_params_from_state_dict(
            _sd_numpy(teacher), vision_layers=V_T, text_layers=T_T,
            fusion_layer=T_T // 2, num_patches=(IMG // PATCH) ** 2,
            with_mlm_head=False)

        v_s = VisionConfig.create(
            vision_width=HID, num_attention_heads=HEADS, intermediate_size=INTER,
            num_hidden_layers=V_S, image_res=IMG, patch_size=PATCH,
            hidden_act="quick_gelu")
        v_t = VisionConfig.create(
            vision_width=HID, num_attention_heads=HEADS, intermediate_size=INTER,
            num_hidden_layers=V_T, image_res=IMG, patch_size=PATCH,
            hidden_act="quick_gelu")
        txt_kw = dict(vocab_size=VOCAB, hidden_size=HID, num_attention_heads=HEADS,
                      intermediate_size=INTER, encoder_width=HID,
                      max_position_embeddings=MAXPOS,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
        t_s = TextConfig.create(num_hidden_layers=T_S, fusion_layer=T_S // 2, **txt_kw)
        t_t = TextConfig.create(num_hidden_layers=T_T, fusion_layer=T_T // 2, **txt_kw)

        student_model = XVLMForRetrieval(v_s, t_s)
        teacher_model = XVLMForRetrieval(v_t, t_t)
        l0_module = XVLML0Module(
            vision_layers=V_S, text_layers=T_S // 2, cross_layers=T_S - T_S // 2,
            hidden_size=HID, intermediate_size=INTER, num_heads=HEADS,
            head_group=1, lagrangian_warmup=LAG_WARMUP, target_sparsity=SPARSITY)

        l0_params = {
            "loga": {t: jnp.asarray(student.l0_module.z_logas[t].detach().numpy())
                     for t in student.l0_module.types},
            "lambda_1": jnp.asarray(0.5), "lambda_2": jnp.asarray(0.3),
        }

        # pin the concrete noise through the production seam
        orig_fwd = L0Module.forward_train
        l0_module.forward_train = (
            lambda p, r, _o=orig_fwd, _s=l0_module: _o(_s, p, r, noise=noise))

        optimizers = (
            create_optimizer(params, lr=LR, weight_decay=WD),
            create_l0_optimizer(reg_lr=REG_LR),
            create_lagrangian_optimizer(reg_lr=REG_LR),
        )
        state = S.init_train_state(params, l0_params, optimizers)
        state = state._replace(step=jnp.asarray(GLOBAL_STEP, jnp.int32))

        batch = {
            "image": jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
            "text_ids": jnp.asarray(ids), "text_atts": jnp.asarray(atts),
            "idx": jnp.asarray(idx),
        }

        # grads: same loss_fn make_retrieval_train_step builds
        def loss_fn(p, loga, lam, rng_):
            zs = l0_module.forward_train({"loga": loga}, rng_)
            s_out = student_model.forward(
                p, batch["image"], batch["text_ids"], batch["text_atts"],
                idx=batch["idx"], zs=zs, rng=rng_,
                output_attentions=True, output_hidden_states=True, train=True)
            t_out = teacher_model.forward(
                jax.lax.stop_gradient(teacher_params),
                batch["image"], batch["text_ids"], batch["text_atts"],
                idx=batch["idx"], zs=None, rng=rng_,
                output_attentions=True, output_hidden_states=True, train=False)
            kd = S.retrieval_kd_losses(s_out, t_out, temperature=1.0)
            loss_small = s_out["loss"]["loss_itc"] + s_out["loss"]["loss_itm"]
            lag, exp_sp, _ = l0_module.lagrangian_regularization(
                {"loga": loga, **lam}, GLOBAL_STEP)
            loss = (kd["loss_kd"] + loss_small) * 0.5 + lag
            return loss, {"loss_itc": s_out["loss"]["loss_itc"],
                          "loss_itm": s_out["loss"]["loss_itm"],
                          "lagrangian_loss": lag, "expected_sparsity": exp_sp, **kd}

        key = jax.random.PRNGKey(0)
        (loss_j, metrics_j), grads_j = jax.jit(
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        )(state.params, state.loga, state.lam, key)

        # one REAL production step (grads + 3-way update + loga clamp)
        train_step = S.make_retrieval_train_step(
            student_model, teacher_model, l0_module, optimizers,
            teacher_params=teacher_params, temperature=1.0)
        new_state, step_metrics = jax.jit(train_step)(state, batch, key, teacher_params)

        my_decay = weight_decay_mask(params)

        return types.SimpleNamespace(
            loss_t=float(loss_t.detach()), metrics_t=metrics_t,
            loss_j=float(loss_j), metrics_j=metrics_j,
            grads_t=grads_t, grads_tree=grads_tree, grads_j=grads_j,
            padam_tree=padam_tree, pfinal_tree=pfinal_tree,
            wdflag_tree=wdflag_tree, my_decay=my_decay,
            params0=params, new_state=new_state, step_metrics=step_metrics,
            l0_step=l0_step, lag_step=lag_step, named=named,
            l0_module_torch=student.l0_module,
        )
    finally:
        torch.multinomial = orig_multinomial
        XVLM.sample_hard_negatives = orig_sample


def test_losses_match(trajectory):
    """(i) every Eff_Retrieval.py loss component matches."""
    t, j = trajectory.metrics_t, trajectory.metrics_j
    for k in ("loss_itc", "loss_itm", "loss_text_kd", "loss_img_kd",
              "loss_cross_kd", "loss_itm_logits_kd", "loss_kd",
              "lagrangian_loss", "expected_sparsity"):
        np.testing.assert_allclose(
            float(j[k]), float(t[k].detach()), rtol=2e-4, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(trajectory.loss_j, trajectory.loss_t, rtol=2e-4)


def test_gradients_match(trajectory):
    """(ii) parameter gradients after one backward, transported through the
    checkpoint remaps, match leaf-for-leaf; loga/λ gradients match too."""
    import jax

    gp, gl, glam = trajectory.grads_j

    flat_want = jax.tree_util.tree_leaves_with_path(trajectory.grads_tree)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(gp))
    assert len(flat_want) == len(flat_got)
    for path, want in flat_want:
        got = np.asarray(flat_got[path])
        # atol floor 1e-8: some grads are mathematically zero (k-proj bias —
        # softmax shift invariance) and both sides produce pure f32 noise
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(
            got, want, rtol=5e-3, atol=max(5e-4 * scale, 1e-8), err_msg=str(path))

    l0t = trajectory.l0_module_torch
    for t in l0t.types:
        want = l0t.z_logas[t].grad.detach().numpy()
        got = np.asarray(gl[t])
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4 * scale,
                                   err_msg=f"loga:{t}")
    np.testing.assert_allclose(float(glam["lambda_1"]),
                               l0t.lambda_1.grad.item(), rtol=5e-3, atol=1e-7)
    np.testing.assert_allclose(float(glam["lambda_2"]),
                               l0t.lambda_2.grad.item(), rtol=5e-3, atol=1e-7)


def test_optimizer_step_matches(trajectory):
    """(iii) parameters after ONE step of the reference's 4-group AdamW
    (+ documented decay-mask divergence) and loga/λ after the L0 and
    negative-lr Lagrangian AdamWs."""
    import jax

    # main params: expected = p_final where decay policies agree,
    # p_adam where the reference decays and we deliberately don't
    flat_adam = jax.tree_util.tree_leaves_with_path(trajectory.padam_tree)
    flat_final = dict(jax.tree_util.tree_leaves_with_path(trajectory.pfinal_tree))
    flat_flags = dict(jax.tree_util.tree_leaves_with_path(trajectory.wdflag_tree))
    flat_mine = dict(jax.tree_util.tree_leaves_with_path(trajectory.my_decay))
    flat_new = dict(jax.tree_util.tree_leaves_with_path(trajectory.new_state.params))
    flat_grad = dict(jax.tree_util.tree_leaves_with_path(trajectory.grads_tree))

    # the one intentional AdamW-variant difference: optax.adamw computes
    # update = m_hat/(sqrt(v_hat)+eps), the transformers-4.12 AdamW the
    # reference pins computes m/(sqrt(v)+eps)*sqrt(bc2)/bc1 — i.e. eps enters
    # UNSCALED by the bias correction. At t=1 both reduce to
    # lr*g/(|g|+e) with e = EPS (optax) vs e = EPS/sqrt(1-b2) (reference), so
    # the step differs by up to lr*|g|(b-a)/((|g|+a)(|g|+b)) per element —
    # ~0.45*lr at |g|~2.7e-8, vanishing for real-sized gradients.
    a_eps, b_eps = EPS, EPS / np.sqrt(1.0 - B2)

    def eps_bound(g, lr=LR):
        g = np.abs(np.asarray(g, np.float64))
        placement = lr * g * (b_eps - a_eps) / ((g + a_eps) * (g + b_eps))
        # Adam's t=1 update is lr*g/(|g|+eps): for mathematically-zero
        # gradients (k-proj biases) each side computes independent f32
        # noise for g, and the update disagreement is bounded by the grad
        # disagreement (the tolerance test_gradients_match enforces)
        # amplified by d(update)/dg <= lr/(|g|+eps)
        grad_tol = 5e-3 * g + max(5e-4 * g.max(), 1e-8) if g.size else 0.0
        noise = lr * np.minimum(1.0, grad_tol / (g + a_eps))
        return placement + noise

    divergent = []
    for path, p_adam in flat_adam:
        p_adam = np.asarray(p_adam, np.float64)
        p_final = np.asarray(flat_final[path], np.float64)
        ref_flag = np.asarray(flat_flags[path])
        # each remapped leaf must have a CONSTANT reference flag — a mixed
        # leaf would mean a remap concatenated decay and no-decay params
        assert np.all(ref_flag == ref_flag.flat[0]), path
        mine = bool(flat_mine[path])
        ref = bool(ref_flag.flat[0])
        if ref and not mine:
            divergent.append(jax.tree_util.keystr(path))
            expected = p_adam
        else:
            # ref-no-decay leaves: p_final == p_adam; never (not ref) & mine
            assert not (mine and not ref), f"we decay, reference doesn't: {path}"
            expected = p_final
        got = np.asarray(flat_new[path], np.float64)
        allowed = 5e-4 * np.abs(expected) + eps_bound(flat_grad[path]) + 2e-6
        bad = np.abs(got - expected) > allowed
        assert not bad.any(), (
            f"{jax.tree_util.keystr(path)}: {int(bad.sum())} elements exceed "
            f"tolerance; max err {np.abs(got - expected).max():.3e}")

    # the documented divergence set: temp, class embedding, LayerNorm/1-D
    # leaves the reference's name filter misses (see module docstring)
    for d in divergent:
        assert any(tok in d.lower() for tok in
                   ("temp", "class_embedding", "ln", "norm", "scale", "bias",
                    "embedding")), f"unexpected decay divergence: {d}"

    # loga: dedicated L0 AdamW only (reference ALSO hits these with the main
    # optimizer — the double-update documented in train/optim.py) + clamp
    l0t = trajectory.l0_module_torch
    import math
    for t in l0t.types:
        p = l0t.z_logas[t]
        want = np.clip(trajectory.l0_step[id(p)][1], math.log(1e-2), math.log(1e2))
        got = np.asarray(trajectory.new_state.loga[t], np.float64)
        allowed = (5e-4 * np.abs(want) + 1e-6
                   + eps_bound(p.grad.detach().numpy(), lr=REG_LR))
        bad = np.abs(got - want) > allowed
        assert not bad.any(), (
            f"loga:{t}: {int(bad.sum())} elements exceed tolerance; "
            f"max err {np.abs(got - want).max():.3e}")

    # λ: negative-lr Lagrangian AdamW (gradient ascent)
    want1 = trajectory.lag_step[id(l0t.lambda_1)][1]
    want2 = trajectory.lag_step[id(l0t.lambda_2)][1]
    np.testing.assert_allclose(float(trajectory.new_state.lam["lambda_1"]),
                               want1, rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(float(trajectory.new_state.lam["lambda_2"]),
                               want2, rtol=5e-4, atol=1e-7)
    # ascent really happened: λ moved OPPOSITE its gradient's descent move
    g1 = l0t.lambda_1.grad.item()
    assert (want1 - 0.5) * g1 > 0 or g1 == 0
