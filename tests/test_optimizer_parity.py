"""Optimizer-semantics parity vs the reference's torch optimizer stack.

The reference builds `torch.optim.Adam` over grouped-lr parameters
(`/root/reference/pythia/models/t2s.py:356-376`,
`/root/reference/pythia/utils/build_utils.py:54-83`), steps a LambdaLR with
`lr_lambda_update` (`/root/reference/pythia/utils/general.py:20-29`) after
every optimizer step, and clips the global grad norm before stepping
(`general.py:32-53`, `base_trainer.py:262-270`).

These tests pin the optax chain in `training/optim.py` to those semantics
exactly on a tiny deterministic problem: schedule formula (inclusive warmup
boundary + bisect_right decay), L2-COUPLED weight decay (torch Adam, not
AdamW), per-group lr scaling, clip-then-decay-then-moments ordering, and the
step-index alignment (first update uses factor(0); update k uses factor(k-1)
because the reference steps the scheduler with current_iteration AFTER
optimizer.step).

The full-model 5-step trajectory test (gradients through the real T2S) lives
in test_train_trajectory_parity.py.
"""

from __future__ import annotations

import types
from bisect import bisect

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vitxtgqa_tpu.training.optim import (
    assert_scales_resolve,
    build_optimizer,
    lr_multiplier_schedule,
    module_lr_scales,
)


def _reference_lr_lambda(i_iter, use_warmup, warmup_factor, warmup_iterations,
                         lr_steps, lr_ratio):
    """Verbatim transcription of lr_lambda_update (general.py:20-29)."""
    if use_warmup is True and i_iter <= warmup_iterations:
        alpha = float(i_iter) / float(warmup_iterations)
        return warmup_factor * (1.0 - alpha) + alpha
    idx = bisect(lr_steps, i_iter)
    return pow(lr_ratio, idx)


@pytest.mark.parametrize(
    "use_warmup,warmup,steps",
    [
        (True, 3, [5, 10]),
        (True, 3, [2, 5]),   # lr_step INSIDE the warmup window: exercises
                             # the inclusive `i_iter <= warmup` boundary
        (False, 3, [5, 10]),
        (True, 1000, [10000, 20000]),  # the shipped t2s_abinet.yml envelope
    ],
)
def test_schedule_matches_reference_formula(use_warmup, warmup, steps):
    sched = lr_multiplier_schedule(
        use_warmup=use_warmup, warmup_factor=0.2, warmup_iterations=warmup,
        lr_steps=steps, lr_ratio=0.1,
    )
    probe = list(range(0, 26)) + [warmup - 1, warmup, warmup + 1] + [
        s + d for s in steps for d in (-1, 0, 1)
    ]
    for i in probe:
        if i < 0:
            continue
        want = _reference_lr_lambda(i, use_warmup, 0.2, warmup, steps, 0.1)
        got = float(sched(i))
        assert abs(got - want) < 1e-7, (i, got, want)


def _torch_reference_trainer_steps(lr, wd, clip, n_steps, tp_cfg, seed=0):
    """Run the reference's exact optimizer stack on the tiny 2-module model.

    Returns (per-step losses, final param dict)."""
    import torch

    torch.manual_seed(seed)
    model = torch.nn.Module()
    model.text_bert = torch.nn.Linear(3, 4, bias=False).double()
    model.head = torch.nn.Linear(3, 2, bias=False).double()

    # grouped lrs exactly as get_optimizer_parameters builds them
    # (t2s.py:356-376): scaled group for the finetune module, default group
    # first so group-0 lr prints as the base lr.
    groups = [
        {"params": list(model.head.parameters())},
        {"params": list(model.text_bert.parameters()), "lr": lr * 0.1},
    ]
    opt = torch.optim.Adam(groups, lr=lr, eps=1e-8, weight_decay=wd)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt,
        lr_lambda=lambda i: _reference_lr_lambda(
            i, tp_cfg["use_warmup"], tp_cfg["warmup_factor"],
            tp_cfg["warmup_iterations"], tp_cfg["lr_steps"], tp_cfg["lr_ratio"],
        ),
    )

    rng = np.random.default_rng(7)
    X = torch.from_numpy(rng.normal(size=(5, 3))).double()
    Yh = torch.from_numpy(rng.normal(size=(5, 2))).double()

    losses = []
    for k in range(1, n_steps + 1):  # current_iteration is 1-indexed
        opt.zero_grad()
        loss = ((model.head(X) - Yh) ** 2).sum() + 0.5 * (model.text_bert(X) ** 2).sum()
        losses.append(float(loss))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
        opt.step()
        # base_trainer.py:269-270: _run_scheduler AFTER optimizer.step,
        # with the 1-indexed current_iteration.
        sched.step(k)
    final = {
        "text_bert": model.text_bert.weight.detach().numpy().copy(),
        "head": model.head.weight.detach().numpy().copy(),
    }
    return losses, final


def _jax_optim_steps(lr, wd, clip, n_steps, tp_cfg, torch_init):
    """Same problem through build_optimizer's optax chain (float64 to make
    the comparison vs torch-double elementwise-exact)."""
    with jax.enable_x64(True):
        return _jax_optim_steps_x64(lr, wd, clip, n_steps, tp_cfg, torch_init)


def _jax_optim_steps_x64(lr, wd, clip, n_steps, tp_cfg, torch_init):
    params = {
        "text_bert": {"kernel": jnp.asarray(torch_init["text_bert"].T)},
        "head": {"kernel": jnp.asarray(torch_init["head"].T)},
    }
    optimizer_attributes = types.SimpleNamespace(
        params={"lr": lr, "eps": 1e-8, "weight_decay": wd}
    )
    tp = types.SimpleNamespace(
        clip_gradients=True, max_grad_l2_norm=clip,
        use_warmup=tp_cfg["use_warmup"], warmup_factor=tp_cfg["warmup_factor"],
        warmup_iterations=tp_cfg["warmup_iterations"], lr_scheduler=True,
        lr_steps=tp_cfg["lr_steps"], lr_ratio=tp_cfg["lr_ratio"],
    )
    model_cfg = types.SimpleNamespace(lr_scale_text_bert=0.1, lr_scale_mmt=None)
    tx, _ = build_optimizer(optimizer_attributes, tp, model_cfg)

    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.normal(size=(5, 3)))
    Yh = jnp.asarray(rng.normal(size=(5, 2)))

    def loss_fn(p):
        pred_h = X @ p["head"]["kernel"]
        pred_t = X @ p["text_bert"]["kernel"]
        return ((pred_h - Yh) ** 2).sum() + 0.5 * (pred_t ** 2).sum()

    opt_state = tx.init(params)
    losses = []
    for _ in range(n_steps):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        losses.append(float(loss))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    final = {
        "text_bert": np.asarray(params["text_bert"]["kernel"]).T,
        "head": np.asarray(params["head"]["kernel"]).T,
    }
    return losses, final


@pytest.mark.parametrize("wd", [0.0, 0.1])
def test_adam_trajectory_matches_torch(wd):
    """8 steps of clipped, grouped-lr, (optionally L2-decayed) Adam under the
    reference's warmup+step schedule — float64, elementwise parity.

    wd=0.1 specifically pins the torch-Adam COUPLED weight-decay semantics:
    AdamW (decoupled) diverges from this trajectory by >1e-3 per step at
    lr=0.05."""
    pytest.importorskip("torch")
    lr, clip, n = 0.05, 0.25, 8
    tp_cfg = dict(use_warmup=True, warmup_factor=0.2, warmup_iterations=2,
                  lr_steps=[5], lr_ratio=0.1)

    t_losses, t_final = _torch_reference_trainer_steps(lr, wd, clip, n, tp_cfg)
    # re-create torch's init to hand to jax
    import torch

    torch.manual_seed(0)
    m = torch.nn.Module()
    m.text_bert = torch.nn.Linear(3, 4, bias=False).double()
    m.head = torch.nn.Linear(3, 2, bias=False).double()
    init = {
        "text_bert": m.text_bert.weight.detach().numpy(),
        "head": m.head.weight.detach().numpy(),
    }

    j_losses, j_final = _jax_optim_steps(lr, wd, clip, n, tp_cfg, init)

    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-9)
    for k in ("text_bert", "head"):
        np.testing.assert_allclose(
            j_final[k], t_final[k], rtol=1e-8, atol=1e-10,
            err_msg=f"{k} params diverged from the torch-Adam trajectory "
                    f"(wd={wd})",
        )


def test_coupled_wd_differs_from_adamw():
    """Guard the guard: the trajectory above must have the power to detect a
    decoupled-decay regression.  Swap the chain's decay for AdamW and assert
    the torch trajectory is NOT reproduced."""
    pytest.importorskip("torch")
    import torch

    lr, wd, clip, n = 0.05, 0.1, 0.25, 8
    tp_cfg = dict(use_warmup=True, warmup_factor=0.2, warmup_iterations=2,
                  lr_steps=[5], lr_ratio=0.1)
    _, t_final = _torch_reference_trainer_steps(lr, wd, clip, n, tp_cfg)

    torch.manual_seed(0)
    m = torch.nn.Module()
    m.text_bert = torch.nn.Linear(3, 4, bias=False).double()
    m.head = torch.nn.Linear(3, 2, bias=False).double()
    init_head = jnp.asarray(m.head.weight.detach().numpy().T)

    sched = lr_multiplier_schedule(True, 0.2, 2, [5], 0.1)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lambda s: lr * sched(s), eps=1e-8, weight_decay=wd),
    )
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.normal(size=(5, 3)))
    Yh = jnp.asarray(rng.normal(size=(5, 2)))
    params = {"head": {"kernel": init_head}}

    def loss_fn(p):
        return ((X @ p["head"]["kernel"] - Yh) ** 2).sum()

    opt_state = tx.init(params)
    for _ in range(n):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    diff = np.abs(np.asarray(params["head"]["kernel"]).T - t_final["head"]).max()
    assert diff > 1e-4, (
        "AdamW trajectory unexpectedly matches torch coupled-wd Adam — the "
        "parity test would not catch a decoupled-decay regression"
    )


def test_assert_scales_resolve():
    params = {"text_bert": {"w": jnp.zeros(2)}, "mmt": {"w": jnp.zeros(2)}}
    assert_scales_resolve({"text_bert": 0.1}, params)  # ok
    assert_scales_resolve({}, params)  # ok
    with pytest.raises(ValueError, match="renamed_module"):
        assert_scales_resolve({"renamed_module": 0.1}, params)


def test_module_lr_scales_reads_config():
    cfg = types.SimpleNamespace(lr_scale_text_bert=0.1, lr_scale_mmt=1.0)
    assert module_lr_scales(cfg) == {"text_bert": 0.1}
    cfg2 = types.SimpleNamespace(lr_scale_text_bert=0.1, lr_scale_mmt=0.5)
    assert module_lr_scales(cfg2) == {"text_bert": 0.1, "mmt": 0.5}
    # the reference only scales text_bert when it was initialized from
    # bert-base (t2s.py:47-59); random init trains at full lr
    cfg3 = types.SimpleNamespace(
        lr_scale_text_bert=0.1, lr_scale_mmt=1.0,
        text_bert_init_from_bert_base=False,
    )
    assert module_lr_scales(cfg3) == {}
