"""Hardware validation of the fused-block in-kernel PRNG dropout
(ops/pallas_block_bwd seed mode, config tpu.kernel_dropout).

Run on a real TPU (the CPU interpret mode's PRNG returns zeros, so these
properties are only checkable on hardware):

  1. same seed -> bit-identical forward; different seed -> different
  2. extracted keep-masks (the _fwd_impl emit_masks test hook) have
     mean ~= keep prob, and DIFFER between the attn and ffn draws
  3. the seed-mode forward equals block_train_reference evaluated with
     the extracted masks (the kernel's XLA-rounding-chain contract)
  4. gradients through the seed-mode custom_vjp match jax.grad of the
     XLA oracle with the extracted masks — proving the BACKWARD kernel
     regenerates the forward's exact stream (same (seed, row-block)
     seeding, same a-then-f draw order)
  5. multi-block rows (rows > block_r) draw DIFFERENT masks per block

Usage: python scripts/validate_block_kernel_dropout.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vitxtgqa_jax_cache")

from vitxtgqa_tpu.ops.pallas_block_bwd import (
    _block_r,
    _fwd_impl,
    block_train,
    block_train_reference,
)

D, M = 768, 3072
RATE = 0.1


def _args(key, rows, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 12)
    mk = lambda k, shape, scale=0.05: (
        jax.random.normal(k, shape, jnp.float32) * scale
    )
    x_q = mk(ks[0], (rows, D), 1.0).astype(dtype)
    ctx = mk(ks[1], (rows, D), 1.0).astype(dtype)
    return (x_q, ctx, mk(ks[2], (D, D)), mk(ks[3], (D,)),
            1.0 + mk(ks[4], (D,)), mk(ks[5], (D,)), mk(ks[6], (D, M)),
            mk(ks[7], (M,)), mk(ks[8], (M, D)), mk(ks[9], (D,)),
            1.0 + mk(ks[10], (D,)), mk(ks[11], (D,)))


def main():
    rows = 2 * _block_r()  # two grid blocks
    args = _args(jax.random.key(0), rows)
    seed = jnp.int32(1234)

    # 1. determinism / seed sensitivity
    y1 = np.asarray(block_train(*args, rate=RATE, dropout_seed=seed))
    y2 = np.asarray(block_train(*args, rate=RATE, dropout_seed=seed))
    y3 = np.asarray(block_train(*args, rate=RATE,
                                dropout_seed=jnp.int32(77)))
    np.testing.assert_array_equal(y1, y2)
    assert not np.array_equal(y1, y3), "seed change had no effect"
    print("1. determinism + seed sensitivity: ok")

    # 2. extracted masks: mean ~= keep, attn != ffn draw, blocks differ
    outs = _fwd_impl(
        *args, None, None, rate=RATE, eps=1e-12, interpret=False,
        has_dropout=True, block_r=_block_r(), seed=seed, seed_mode=True,
        emit_masks=True,
    )
    y_k, mask_a, mask_f = np.asarray(outs[0]), np.asarray(outs[5]), \
        np.asarray(outs[6])
    keep = 1.0 - RATE
    for name, m in (("attn", mask_a), ("ffn", mask_f)):
        mean = m.mean()
        assert abs(mean - keep) < 0.01, (name, mean)
    assert not np.array_equal(mask_a, mask_f), "a and f draws identical"
    b = _block_r()
    assert not np.array_equal(mask_a[:b], mask_a[b:]), "blocks identical"
    print(f"2. mask stats ok (mean_a={mask_a.mean():.4f}, "
          f"mean_f={mask_f.mean():.4f}, keep={keep})")

    # 3. forward equals the oracle with the extracted masks
    y_ref = np.asarray(block_train_reference(
        *args, mask_a=jnp.asarray(mask_a), mask_f=jnp.asarray(mask_f),
        rate=RATE,
    ))
    np.testing.assert_allclose(
        y_k.astype(np.float32), y_ref.astype(np.float32), atol=2e-2,
        rtol=2e-2,
    )
    # and the public entry returns the same y as the emit_masks run
    np.testing.assert_array_equal(y1, y_k)
    print("3. forward == oracle(extracted masks): ok")

    # 4. grad parity: backward kernel regenerates the forward's stream
    def loss_kernel(*a):
        y = block_train(*a, rate=RATE, dropout_seed=seed)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_ref(*a):
        y = block_train_reference(
            *a, mask_a=jnp.asarray(mask_a), mask_f=jnp.asarray(mask_f),
            rate=RATE,
        )
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    got = jax.grad(loss_kernel, argnums=tuple(range(12)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(12)))(*args)
    names = ("x_q", "ctx", "wo", "bo", "s1", "g1", "w1", "b1", "w2",
             "b2", "s2", "g2")
    for n, g, w in zip(names, got, want):
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        scale = max(np.abs(w).max(), 1e-6)
        rel = np.abs(g - w).max() / scale
        assert rel < 0.02, (n, rel)
        print(f"4. d{n}: max rel diff {rel:.2e} ok")

    print("validate_block_kernel_dropout: ALL OK")


if __name__ == "__main__":
    main()
