"""Fused-block BACKWARD kernel vs jax.vjp of the XLA oracle (interpret
mode on CPU).

The kernel (ops/pallas_block_bwd.py) computes every gradient of the
training-mode post-attention block in one pass; the oracle is
``block_train_reference`` — the literal XLA expression of
``TransformerLayer._finish``'s non-fused training path (reference hot loop
/root/reference/pythia/trainers/base_trainer.py:262-272)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitxtgqa_tpu.ops.pallas_block_bwd import (
    block_train,
    block_train_reference,
)

D, M = 256, 512


def _args(key, rows, dtype, d=D, m=M):
    ks = jax.random.split(key, 12)
    mk = lambda k, shape, scale=0.05: (
        jax.random.normal(k, shape, jnp.float32) * scale
    )
    x_q = mk(ks[0], (rows, d), 1.0).astype(dtype)
    ctx = mk(ks[1], (rows, d), 1.0).astype(dtype)
    wo = mk(ks[2], (d, d))
    bo = mk(ks[3], (d,))
    s1 = 1.0 + mk(ks[4], (d,))
    g1 = mk(ks[5], (d,))
    w1 = mk(ks[6], (d, m))
    b1 = mk(ks[7], (m,))
    w2 = mk(ks[8], (m, d))
    b2 = mk(ks[9], (d,))
    s2 = 1.0 + mk(ks[10], (d,))
    g2 = mk(ks[11], (d,))
    return x_q, ctx, wo, bo, s1, g1, w1, b1, w2, b2, s2, g2


def _masks(key, rows, rate, d=D):
    k1, k2 = jax.random.split(key)
    keep = 1.0 - rate
    return (
        jax.random.bernoulli(k1, keep, (rows, d)),
        jax.random.bernoulli(k2, keep, (rows, d)),
    )


def _grad_pair(args, masks, rate, dtype):
    """(kernel grads, oracle grads) for a shared scalar loss."""
    mask_a, mask_f = masks if masks is not None else (None, None)

    def loss_kernel(*a):
        y = block_train(*a, mask_a=mask_a, mask_f=mask_f, rate=rate,
                        interpret=True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_ref(*a):
        y = block_train_reference(*a, mask_a=mask_a, mask_f=mask_f,
                                  rate=rate)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    got = jax.grad(loss_kernel, argnums=tuple(range(12)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(12)))(*args)
    return got, want


NAMES = ("x_q", "ctx", "wo", "bo", "s1", "g1", "w1", "b1", "w2", "b2",
         "s2", "g2")


@pytest.mark.parametrize("rows", [256, 300])  # 300: pad-row path
@pytest.mark.parametrize("rate", [0.0, 0.1])
def test_grad_parity_f32(rows, rate):
    key = jax.random.key(0)
    args = _args(key, rows, jnp.float32)
    masks = _masks(jax.random.key(7), rows, rate) if rate > 0 else None
    got, want = _grad_pair(args, masks, rate, jnp.float32)
    for n, g, w in zip(NAMES, got, want):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            rtol=2e-4, atol=2e-4, err_msg=n,
        )


def test_forward_matches_reference():
    args = _args(jax.random.key(1), 256, jnp.float32)
    y = block_train(*args, rate=0.0, interpret=True)
    want = block_train_reference(*args, rate=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-6)


def test_grad_parity_bf16():
    """bf16 activations, f32 params — the production training dtype mix."""
    rows, rate = 512, 0.1
    args = _args(jax.random.key(2), rows, jnp.bfloat16)
    masks = _masks(jax.random.key(9), rows, rate)
    got, want = _grad_pair(args, masks, rate, jnp.bfloat16)
    for n, g, w in zip(NAMES, got, want):
        gf = np.asarray(g, np.float32)
        wf = np.asarray(w, np.float32)
        # bf16 cotangents: compare with a scale-relative tolerance (the
        # kernel accumulates dW in f32, XLA rounds through bf16)
        scale = max(np.abs(wf).max(), 1e-3)
        np.testing.assert_allclose(gf / scale, wf / scale, atol=3e-2,
                                   err_msg=n)


def test_multi_block_accumulation():
    """Weight grads accumulate across >1 grid step (rows > block)."""
    rows = 256 * 3 + 64
    args = _args(jax.random.key(3), rows, jnp.float32)
    got, want = _grad_pair(args, None, 0.0, jnp.float32)
    for n, g, w in zip(NAMES, got, want):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            rtol=3e-4, atol=3e-4, err_msg=n,
        )


def test_mask_zero_rows_drop_grads():
    """A fully-dropped activation contributes nothing through that path."""
    rows, rate = 256, 0.5
    args = _args(jax.random.key(4), rows, jnp.float32)
    mask_a = jnp.zeros((rows, D), bool)
    mask_f = jnp.zeros((rows, D), bool)

    def loss(*a):
        y = block_train(*a, mask_a=mask_a, mask_f=mask_f, rate=rate,
                        interpret=True)
        return jnp.sum(y)

    grads = jax.grad(loss, argnums=(2, 3, 8, 9))(*args)  # wo, bo, w2, b2
    for g in grads:
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_flax_layer_integration():
    """TransformerLayer._finish routed through block_train (gates patched
    for CPU) matches the plain flax path: value and grads, dropout off."""
    from vitxtgqa_tpu.models import common
    from vitxtgqa_tpu.models.common import TransformerConfig, TransformerLayer
    from vitxtgqa_tpu.ops import attention as att

    cfg = TransformerConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=M, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, dtype=jnp.float32,
    )
    layer = TransformerLayer(cfg)
    b, l = 2, 64
    x = jax.random.normal(jax.random.key(5), (b, l, D), jnp.float32)
    bias = jnp.zeros((b, 1, 1, l), jnp.float32)
    params = layer.init(jax.random.key(6), x, bias)["params"]

    def run(p, x):
        return layer.apply(
            {"params": p}, x, bias, False,
            rngs={"dropout": jax.random.key(8)},
        )

    def total(p):
        return jnp.sum(jnp.sin(run(p, x)))

    base_val, base_grads = jax.value_and_grad(total)(params)

    # force the fused-bwd path on CPU: patch the TPU gate + interpret mode
    import vitxtgqa_tpu.ops.pallas_block_bwd as pbb

    orig_on_tpu = att._on_tpu
    orig_bt = pbb.block_train
    common.set_fused_block_bwd(True)
    att._on_tpu = lambda: True
    pbb.block_train = functools.partial(orig_bt, interpret=True)
    try:
        fused_val, fused_grads = jax.value_and_grad(total)(params)
    finally:
        common.set_fused_block_bwd(False)
        att._on_tpu = orig_on_tpu
        pbb.block_train = orig_bt

    np.testing.assert_allclose(
        float(fused_val), float(base_val), rtol=1e-5
    )
    flat_b = jax.tree_util.tree_leaves_with_path(base_grads)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(fused_grads))
    # keys covered by the block kernel must match; attention-side params
    # (query/key/value) flow through dctx and must match too
    for path, g in flat_b:
        f = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(f, np.float32), np.asarray(g, np.float32),
            rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_flax_layer_integration_tanh_residual():
    """The QTV joint-residual layer (tanh_residual_base) composes with the
    fused backward: kernel covers the block, XLA autodiffs base+tanh."""
    from vitxtgqa_tpu.models import common
    from vitxtgqa_tpu.models.common import TransformerConfig, TransformerLayer
    from vitxtgqa_tpu.ops import attention as att

    cfg = TransformerConfig(
        hidden_size=D, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=M, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, dtype=jnp.float32,
    )
    layer = TransformerLayer(cfg)
    b, l = 2, 64
    x = jax.random.normal(jax.random.key(15), (b, l, D), jnp.float32)
    base = jax.random.normal(jax.random.key(16), (b, l, D), jnp.float32)
    bias = jnp.zeros((b, 1, 1, l), jnp.float32)
    params = layer.init(jax.random.key(6), x, bias)["params"]

    def total(p):
        y = layer.apply(
            {"params": p}, x, bias, False,
            rngs={"dropout": jax.random.key(8)},
            tanh_residual_base=base,
        )
        return jnp.sum(jnp.sin(y))

    base_val, base_grads = jax.value_and_grad(total)(params)

    import vitxtgqa_tpu.ops.pallas_block_bwd as pbb

    orig_on_tpu = att._on_tpu
    orig_bt = pbb.block_train
    common.set_fused_block_bwd(True)
    att._on_tpu = lambda: True
    pbb.block_train = functools.partial(orig_bt, interpret=True)
    try:
        fused_val, fused_grads = jax.value_and_grad(total)(params)
    finally:
        common.set_fused_block_bwd(False)
        att._on_tpu = orig_on_tpu
        pbb.block_train = orig_bt

    np.testing.assert_allclose(float(fused_val), float(base_val), rtol=1e-5)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(fused_grads))
    for path, g in jax.tree_util.tree_leaves_with_path(base_grads):
        np.testing.assert_allclose(
            np.asarray(flat_f[path], np.float32),
            np.asarray(g, np.float32), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


# ---------------------------------------------------------------------------
# Pallas RECOMPUTE forward (round 5): the fwd rule routed through a single
# kernel producing y + all residuals (set_block_recompute_fwd).
#
# Structural note (documented by test_recompute_fwd_primal_is_fwd_rule):
# under jax.grad the custom_vjp primal phase is the DCE'd FWD RULE, not the
# primal function — so the kernel runs in BOTH the primal and the remat
# recompute phase (an opaque pallas_call cannot be partially DCE'd the way
# the XLA residual ops are).  The hardware A/B therefore weighs the
# primal's extra residual writes against the recompute's fusion wins
# (tools/bench_train.py BENCH_FUSED_BLOCK_FWD).
# ---------------------------------------------------------------------------


@pytest.fixture
def _recompute_fwd_flag():
    from vitxtgqa_tpu.ops.pallas_block_bwd import set_block_recompute_fwd

    set_block_recompute_fwd(True)
    yield
    set_block_recompute_fwd(False)


@pytest.mark.parametrize("rows,rate", [(256, 0.0), (300, 0.1)])
def test_recompute_fwd_grad_parity_f32(rows, rate, _recompute_fwd_flag):
    key = jax.random.key(0)
    args = _args(key, rows, jnp.float32)
    masks = _masks(jax.random.key(7), rows, rate) if rate > 0 else None
    got, want = _grad_pair(args, masks, rate, jnp.float32)
    for n, g, w in zip(NAMES, got, want):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            rtol=2e-4, atol=2e-4, err_msg=n,
        )


def test_recompute_fwd_grad_parity_bf16(_recompute_fwd_flag):
    rows, rate = 512, 0.1
    args = _args(jax.random.key(2), rows, jnp.bfloat16)
    masks = _masks(jax.random.key(9), rows, rate)
    got, want = _grad_pair(args, masks, rate, jnp.bfloat16)
    for n, g, w in zip(NAMES, got, want):
        gf = np.asarray(g, np.float32)
        wf = np.asarray(w, np.float32)
        scale = max(np.abs(wf).max(), 1e-3)
        np.testing.assert_allclose(gf / scale, wf / scale, atol=3e-2,
                                   err_msg=n)


def test_recompute_fwd_value_parity(_recompute_fwd_flag):
    """The kernel y (what a vjp trace consumes) matches the XLA forward."""
    args = _args(jax.random.key(1), 256, jnp.float32)

    def f(*a):
        return block_train(*a, rate=0.0, interpret=True)

    y, _ = jax.vjp(f, *args)
    want = block_train_reference(*args, rate=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=2e-6,
                               atol=2e-6)


def test_recompute_fwd_under_remat(_recompute_fwd_flag):
    """grad through jax.checkpoint(nothing_saveable) with the recompute
    kernel active matches the plain XLA oracle."""
    args = _args(jax.random.key(3), 256, jnp.float32)

    def loss_k(*a):
        f = lambda *aa: jnp.sum(
            jnp.sin(block_train(*aa, rate=0.0, interpret=True))
        )
        return jax.checkpoint(
            f, policy=jax.checkpoint_policies.nothing_saveable
        )(*a)

    def loss_r(*a):
        return jnp.sum(jnp.sin(block_train_reference(*a, rate=0.0)))

    gk = jax.grad(loss_k, argnums=tuple(range(12)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(12)))(*args)
    for n, g, w in zip(NAMES, gk, gr):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=3e-4, atol=3e-4, err_msg=n
        )


def test_recompute_fwd_primal_is_fwd_rule(_recompute_fwd_flag):
    """Documents the partial-eval mechanics the design rests on: under
    grad+remat the primal section contains the fwd rule's kernel call
    (custom_vjp primal functions are discarded when differentiated), and
    the remat eqn re-runs it for the residuals."""
    args = _args(jax.random.key(3), 256, jnp.float32)

    def loss_k(*a):
        f = lambda *aa: jnp.sum(
            jnp.sin(block_train(*aa, rate=0.0, interpret=True))
        )
        return jax.checkpoint(
            f, policy=jax.checkpoint_policies.nothing_saveable
        )(*a)

    jaxpr = jax.make_jaxpr(jax.grad(loss_k, argnums=(0,)))(*args)
    top_prims = [e.primitive.name for e in jaxpr.jaxpr.eqns]
    assert "remat2" in top_prims
    # the primal phase calls _fwd_impl (a jit eqn) with only y consumed
    fwd_eqns = [
        e for e in jaxpr.jaxpr.eqns
        if e.primitive.name == "jit" and e.params.get("name") == "_fwd_impl"
    ]
    assert fwd_eqns, top_prims
    assert len(fwd_eqns[0].outvars) == 1  # y only; residuals DCE'd at
    # the jit-output level (the pallas_call inside still writes them)


def test_kernel_dropout_flag_safe_off_tpu():
    """tpu.kernel_dropout (in-kernel PRNG masks, seed mode) is gated to
    TPU backends by TransformerLayer._fused_block_bwd_ok: with the flag
    set on a CPU backend the layer takes the plain XLA path, produces
    bit-identical outputs, and never draws the seed (hardware behaviour
    is validated by scripts/validate_block_kernel_dropout.py)."""
    from vitxtgqa_tpu.models.common import (
        TransformerConfig,
        TransformerLayer,
        set_fused_block_bwd,
    )
    from vitxtgqa_tpu.ops.masks import joint_mask_spec
    from vitxtgqa_tpu.ops.pallas_block_bwd import set_kernel_dropout

    cfg = TransformerConfig(
        hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=128, hidden_dropout_prob=0.1,
    )
    layer = TransformerLayer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 24, 64))
    spec = joint_mask_spec(jnp.ones((2, 20), jnp.float32), 4)
    params = layer.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)},
        x, spec, deterministic=False,
    )["params"]

    def fwd():
        return layer.apply(
            {"params": params}, x, spec, deterministic=False,
            rngs={"dropout": jax.random.key(7)},
        )

    set_fused_block_bwd(True)
    try:
        set_kernel_dropout(False)
        base = np.asarray(fwd())
        set_kernel_dropout(True)
        with_flag = np.asarray(fwd())
    finally:
        set_kernel_dropout(False)
        set_fused_block_bwd(False)
    np.testing.assert_array_equal(base, with_flag)
