"""Same-process hardware A/B: bf16 einsum ptr scores vs batch-tiled int8 kernel.

Decides whether ops.pallas_attention.ptr_scores_int8 (batch-tiled rewrite of
the measured-negative [B]-grid matvec) should replace the bf16 ptr keys in the
decode scan (models/base.py:200).  Times a 12-step chained block per variant
(each step's query depends on the previous step's full score tensor, so XLA
cannot batch the steps into one pass over the keys), fenced once per block via
a D2H digest, interleaved A/B/A/B (tunnel throughput drifts between runs).

Usage:  python tools/ab_ptr_keys.py   (on the TPU tunnel; ~2 min compile)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vitxtgqa_jax_cache")

from vitxtgqa_tpu.ops.attention import quantize_kv
from vitxtgqa_tpu.ops.pallas_attention import ptr_scores_int8

B, N, D, STEPS = 576, 960, 768, 12


def chain_bf16(q0, k, mask):
    inv = 1.0 / jnp.sqrt(jnp.float32(D))

    def step(q, _):
        s = jnp.einsum(
            "bsd,bnd->bsn", q, k, preferred_element_type=jnp.float32
        ) * inv + mask[:, None, :]
        return q + s[..., :D].astype(q.dtype) * jnp.bfloat16(1e-3), ()

    qf, _ = jax.lax.scan(step, q0, None, length=STEPS)
    return qf


def chain_int8(q0, k8, ks, mask, bt: int):
    def step(q, _):
        s = ptr_scores_int8(q, k8, ks, mask, batch_tile=bt)
        return q + s[..., :D].astype(q.dtype) * jnp.bfloat16(1e-3), ()

    qf, _ = jax.lax.scan(step, q0, None, length=STEPS)
    return qf


def main():
    q0 = jax.random.normal(jax.random.PRNGKey(0), (B, 1, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
    mask = (
        jax.random.uniform(jax.random.PRNGKey(2), (B, N)) > 0.3
    ).astype(jnp.float32)
    k8, ks = quantize_kv(k)

    fns = {"bf16_einsum": jax.jit(functools.partial(chain_bf16, k=k, mask=mask))}
    for bt in (8, 16, 32):
        fns[f"int8_tile{bt}"] = jax.jit(
            functools.partial(chain_int8, k8=k8, ks=ks, mask=mask, bt=bt)
        )

    # compile + warm up everything first
    for name, fn in fns.items():
        t0 = time.perf_counter()
        for attempt in range(3):  # remote-compile helper drops connections
            try:
                out = fn(q0)
                _ = float(jnp.sum(out.astype(jnp.float32)))
                break
            except Exception as e:
                if "UNAVAILABLE" not in str(e) or attempt == 2:
                    raise
                print(f"retrying {name} after: {str(e)[:120]}", flush=True)
                time.sleep(60)
        print(f"compile+first {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    times = {name: [] for name in fns}
    for rep in range(6):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            out = fn(q0)
            _ = float(jnp.sum(out.astype(jnp.float32)))  # D2H fence
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ms = [t * 1e3 for t in ts]
        print(f"{name}: min {min(ms):.2f} ms  med {sorted(ms)[len(ms)//2]:.2f}"
              f"  all {['%.1f' % m for m in ms]}", flush=True)


if __name__ == "__main__":
    main()
