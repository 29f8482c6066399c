"""Sequence-parallel attention plumbing.

The reference never shards sequence length (total joint sequence is 1056
tokens, SURVEY.md §5.7), so SP is a capability extension designed into the
attention API rather than a parity requirement: a mesh `sp` axis splits the
sequence across devices; each device computes its query shard against
all-gathered keys/values (XLA emits the all-gather over ICI).

For 1056 tokens the all-gather-KV formulation is the right one — K/V for a
full head is ~260KB, far below ICI/HBM limits; ring attention only pays off
at orders-of-magnitude longer sequences (noted in ROADMAP.md).

Integration: `set_sp(mesh, axis)` (config:
training_parameters.tpu.sequence_parallel) makes every full-sequence
`ops.attention.mha` call route here, so all transformer stacks become
sequence-parallel without model changes.  Masks arrive either as additive
bias tensors or as a compact ops.masks.MaskSpec — for the latter each shard
rebuilds only its own query rows' bias from the gathered key mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vitxtgqa_tpu.ops.attention import mha_reference
from vitxtgqa_tpu.ops.masks import NEG_INF, MaskSpec

_SP_MESH: Optional[Mesh] = None
_SP_AXIS: str = "sp"


def set_sp(mesh: Optional[Mesh], axis: str = "sp") -> None:
    """Process-wide sequence-parallel switch consumed by ops.attention.mha."""
    global _SP_MESH, _SP_AXIS
    _SP_MESH = mesh
    _SP_AXIS = axis


def get_sp():
    return _SP_MESH, _SP_AXIS


def _local_rows_bias(key_mask_full, dec_len: int, row_offset, l_local: int):
    """Bias for this shard's query rows from the full [B, L] key mask.

    Reproduces masks.prefix_lm_bias row-slice semantics: every row sees
    valid encoder keys; rows in the decoder block additionally see decoder
    keys causally.
    """
    b, l = key_mask_full.shape
    l_enc = l - dec_len
    rows = row_offset + jnp.arange(l_local)[:, None]  # [l_local, 1] global q idx
    cols = jnp.arange(l)[None, :]  # [1, L]
    allowed = key_mask_full[:, None, :] > 0  # [B, 1, L]
    if dec_len > 0:
        causal = (
            (cols >= l_enc) & (cols < l) & (rows >= l_enc)
            & (cols - l_enc <= rows - l_enc)
        )  # [l_local, L]
        allowed = allowed | causal[None]
    return jnp.where(allowed, 0.0, NEG_INF)[:, None, :, :]  # [B,1,l_local,L]


def sp_attention(
    q: jax.Array,  # [B, H, L, D] global view
    k: jax.Array,
    v: jax.Array,
    bias,  # None | [B,1,1,L] | [B,1,L,L] | MaskSpec
    mesh: Mesh,
    axis: str = "sp",
) -> jax.Array:
    """Attention with the sequence dim sharded over `axis`.

    Each shard holds L/sp query rows; keys/values (and the key mask) all-
    gather inside the mapped function so softmax normalisation spans the
    full sequence.
    """
    n_shards = mesh.shape[axis]
    l = q.shape[2]
    assert l % n_shards == 0, (l, n_shards)
    l_local = l // n_shards

    # composition with other manual axes (e.g. sp inside the gpipe pp
    # shard_map): inside a manual region shard_map requires the CONTEXT
    # abstract mesh, not the concrete one — jax rejects a concrete mesh
    # whose axis_types disagree with the surrounding Manual axes
    # (tests/test_sequence_parallel.py::test_sp_inside_pp_composes)
    ctx = jax.sharding.get_abstract_mesh()
    if not ctx.empty and axis in ctx.axis_names:
        mesh = ctx

    spec = P(None, None, axis, None)

    if isinstance(bias, MaskSpec):
        key_mask, dec_len = bias.key_mask, bias.dec_len

        # the flash kernel composes with SP: each shard runs its Lq = L/sp
        # query rows against the gathered keys, with the in-kernel
        # prefix-LM/causal mask built from the shard's global row offset
        # (flash_attention's row_offset — a dynamic axis_index scalar)
        from vitxtgqa_tpu.ops.attention import _PALLAS_MIN_KV, _on_tpu
        from vitxtgqa_tpu.ops.attention import pallas_enabled

        use_flash = (
            pallas_enabled() and _on_tpu() and l >= _PALLAS_MIN_KV
        )

        def local(q_s, k_s, v_s, mask_s):
            k_full = jax.lax.all_gather(k_s, axis, axis=2, tiled=True)
            v_full = jax.lax.all_gather(v_s, axis, axis=2, tiled=True)
            mask_full = jax.lax.all_gather(mask_s, axis, axis=1, tiled=True)
            offset = jax.lax.axis_index(axis) * l_local
            if use_flash:
                from vitxtgqa_tpu.ops.pallas_attention import flash_attention

                return flash_attention(
                    q_s, k_full, v_full, mask_full, dec_len,
                    row_offset=offset,
                )
            bias_local = _local_rows_bias(mask_full, dec_len, offset, l_local)
            return mha_reference(q_s, k_full, v_full, bias_local)

        mapped = shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec, spec, P(None, axis)),
            out_specs=spec,
            axis_names={axis},  # other mesh axes (data/model) stay auto
            # pallas_call's out_shape carries no varying-mesh-axes (vma)
            # annotation; the explicit specs above make the check redundant
            check_vma=False,
        )
        return mapped(q, k, v, key_mask.astype(jnp.float32))

    per_row = bias is not None and bias.shape[2] != 1

    def local(q_s, k_s, v_s, bias_s):
        k_full = jax.lax.all_gather(k_s, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_s, axis, axis=2, tiled=True)
        if bias_s is not None and not per_row:
            bias_s = jax.lax.all_gather(bias_s, axis, axis=3, tiled=True)
        return mha_reference(q_s, k_full, v_full, bias_s)

    if bias is None:
        bias_spec = None
    elif per_row:
        bias_spec = P(None, None, axis, None)  # rows shard with queries
    else:
        bias_spec = P(None, None, None, axis)  # key-validity row gathers
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, bias_spec),
        out_specs=spec,
        axis_names={axis},  # other mesh axes (data/model) stay auto
    )
    return mapped(q, k, v, bias)
