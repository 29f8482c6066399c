"""Sequence-parallel attention plumbing.

The reference never shards sequence length (total joint sequence is 1056
tokens, SURVEY.md §5.7), so SP is a capability extension designed into the
attention API rather than a parity requirement: a mesh `sp` axis splits the
sequence across devices; each device computes its query shard against
all-gathered keys/values (XLA emits the all-gather over ICI).

For 1056 tokens the all-gather-KV formulation is the right one — K/V for a
full head is ~260KB, far below ICI/HBM limits; ring attention only pays off
at orders-of-magnitude longer sequences (noted in ROADMAP.md).

Usage: wrap an attention call whose inputs are sharded [B, H, L/sp, D] along
the sequence axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vitxtgqa_tpu.ops.attention import mha_reference


def sp_attention(
    q: jax.Array,  # [B, H, L, D] global view
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],  # [B, 1, 1, L] key-validity bias or None
    mesh: Mesh,
    axis: str = "sp",
) -> jax.Array:
    """Attention with the sequence dim sharded over `axis`.

    Each shard holds L/sp query rows; keys/values/bias all-gather inside the
    mapped function so softmax normalisation spans the full sequence.
    """
    n_shards = mesh.shape[axis]
    l = q.shape[2]
    assert l % n_shards == 0, (l, n_shards)

    def local(q_s, k_s, v_s, bias_s):
        k_full = jax.lax.all_gather(k_s, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_s, axis, axis=2, tiled=True)
        bias_full = (
            jax.lax.all_gather(bias_s, axis, axis=3, tiled=True)
            if bias_s is not None
            else None
        )
        return mha_reference(q_s, k_full, v_full, bias_full)

    specs = P(None, None, axis, None)
    bias_spec = P(None, None, None, axis) if bias is not None else None
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(specs, specs, specs, bias_spec),
        out_specs=specs,
    )
    return mapped(q, k, v, bias)
