"""Hardware validation of the flash-attention in-kernel dropout.

Run on a real TPU (the CPU interpret mode's PRNG returns zeros, so these
properties are only checkable on hardware):

  1. rate=0 exactly equals the no-dropout kernel
  2. same seed -> identical output; different seed -> different output
  3. mean over many seeds approaches the no-dropout output (keep-prob rescale)
  4. forward AND gradients match XLA computations that use the *exact*
     keep mask dumped from the kernel's PRNG (same seed + block uid) —
     proving the backward kernel regenerates the forward's pattern.
     (A finite-difference check is useless here: at these sizes the fp32
     loss-sum cancellation noise exceeds the directional derivative even
     at dropout_rate=0.)

Usage: python scripts/validate_dropout_kernel.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vitxtgqa_jax_cache")

from vitxtgqa_tpu.ops.pallas_attention import flash_attention


def main():
    r = jax.random.split(jax.random.key(0), 3)
    b, h, l, d = 2, 4, 256, 64
    q = jax.random.normal(r[0], (b, h, l, d), jnp.float32)
    k = jax.random.normal(r[1], (b, h, l, d), jnp.float32)
    v = jax.random.normal(r[2], (b, h, l, d), jnp.float32)
    mask = jnp.ones((b, l), jnp.float32)

    base = np.asarray(flash_attention(q, k, v, mask))

    z = np.asarray(
        flash_attention(q, k, v, mask, dropout_rate=0.0,
                        dropout_seed=jnp.int32(5))
    )
    np.testing.assert_array_equal(z, base)
    print("1. rate=0 == no-dropout: OK")

    d1 = np.asarray(flash_attention(q, k, v, mask, dropout_rate=0.3,
                                    dropout_seed=jnp.int32(42)))
    d2 = np.asarray(flash_attention(q, k, v, mask, dropout_rate=0.3,
                                    dropout_seed=jnp.int32(42)))
    d3 = np.asarray(flash_attention(q, k, v, mask, dropout_rate=0.3,
                                    dropout_seed=jnp.int32(7)))
    np.testing.assert_array_equal(d1, d2)
    assert not np.allclose(d1, d3), "different seeds produced equal outputs"
    assert not np.allclose(d1, base), "dropout output equals no-dropout"
    print("2. determinism per seed / divergence across seeds: OK")

    f = jax.jit(lambda s: flash_attention(
        q, k, v, mask, dropout_rate=0.3, dropout_seed=s))
    acc = np.zeros_like(base)
    n = 64
    for s in range(n):
        acc += np.asarray(f(jnp.int32(s)))
    err = np.abs(acc / n - base).max()
    print(f"3. E[dropout] ~= base: max abs err {err:.4f} "
          f"({'OK' if err < 0.3 else 'FAIL'})")
    assert err < 0.3

    # 4. dump the kernel's keep mask, rebuild the dropout attention in XLA
    # with that exact mask, compare forward + all three gradients
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vitxtgqa_tpu.ops.pallas_attention import _block_uid, _dropout_keep

    rate = 0.4
    seed = jnp.asarray([3], jnp.int32)

    def dump_kernel(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0], _block_uid())
        o_ref[0, 0] = _dropout_keep((l, l), rate).astype(jnp.float32)

    keep = pl.pallas_call(
        dump_kernel,
        grid=(b, h, 1),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, l, l), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, l, l), jnp.float32),
    )(seed)

    def xla_fwd(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
        p = jax.nn.softmax(s, axis=-1)
        pd = jnp.where(keep > 0, p / (1 - rate), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", pd, v)

    f_pallas = lambda q, k, v: flash_attention(
        q, k, v, mask, dropout_rate=rate, dropout_seed=seed[0]
    )
    fd = float(jnp.max(jnp.abs(f_pallas(q, k, v) - xla_fwd(q, k, v))))
    g_p = jax.grad(lambda *a: f_pallas(*a).sum(), argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(lambda *a: xla_fwd(*a).sum(), argnums=(0, 1, 2))(q, k, v)
    rels = [
        float(jnp.max(jnp.abs(a - b_)) / (jnp.max(jnp.abs(b_)) + 1e-9))
        for a, b_ in zip(g_p, g_x)
    ]
    print(f"4. fwd/bwd vs XLA on the dumped mask: fwd maxdiff {fd:.2e}, "
          f"grad rels {['%.1e' % r for r in rels]} "
          f"({'OK' if fd < 1e-2 and max(rels) < 1e-2 else 'FAIL'})")
    assert fd < 1e-2 and max(rels) < 1e-2

    print("all dropout-kernel hardware checks passed")


if __name__ == "__main__":
    main()
