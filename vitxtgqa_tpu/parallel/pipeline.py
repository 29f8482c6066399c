"""Pipeline parallelism over transformer layers (GPipe-style schedule).

The reference has no pipeline parallelism (SURVEY.md §2.9 — DP only); this
is a TPU-native capability extension for >8-chip pods where the MMT layer
stack is split over a `pp` mesh axis and microbatches stream through the
stages via `ppermute` over ICI.

Formulation: every device holds the parameters of one *stage* (a contiguous
slice of layers, sharded over the axis on a stacked leading dim).  The
schedule runs M + S - 1 ticks (M microbatches, S stages); at tick t stage s
computes microbatch t - s.  Warmup/drain ticks compute on zero inputs —
wasted FLOPs proportional to (S-1)/(M+S-1), the standard GPipe bubble.

All control flow is static (Python loop over ticks, masked selects on the
stage index), so the whole schedule jits into one XLA program with
`ppermute` collectives — no host round-trips between ticks.

The payload is a pytree: per-microbatch context (attention bias rows,
masks) rides along with the activations through the ring, so stages always
see the bias belonging to the microbatch they are computing.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(per_stage_params) -> Any:
    """[stage0_tree, stage1_tree, ...] -> one tree with stacked leaves."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def gpipe(
    stage_fn: Callable[[Any, Any], Any],
    stacked_params: Any,  # leaves [S, ...] — stage s uses leaf[s]
    payload: Any,  # pytree, every leaf [B, ...] global batch
    mesh: Mesh,
    axis: str = "pp",
    num_microbatches: int = 0,
) -> Any:
    """Sequentially compose S stages over microbatched `payload`.

    stage_fn(stage_params, payload_mb) -> payload_mb must preserve the
    payload structure and shapes (transformer layer stacks do).  Returns
    stage_{S-1}(...stage_0(payload)) with leaves [B, ...].
    """
    n_stages = mesh.shape[axis]
    leaves = jax.tree.leaves(payload)
    b = leaves[0].shape[0]
    m = num_microbatches or n_stages
    assert b % m == 0, f"batch {b} not divisible into {m} microbatches"
    mb = b // m

    payload_mb = jax.tree.map(
        lambda a: a.reshape((m, mb) + a.shape[1:]), payload
    )

    def device_fn(params_s, x_all):
        # params_s leaves [1, ...] (this stage's slice); x_all leaves [M, mb, ...]
        params_s = jax.tree.map(lambda p: p[0], params_s)
        s = jax.lax.axis_index(axis)
        is_first = s == 0
        is_last = s == n_stages - 1

        take = lambda tree, t: jax.tree.map(lambda a: a[t], tree)
        zeros = jax.tree.map(lambda a: jnp.zeros_like(a[0]), x_all)
        recv = zeros
        outs = jax.tree.map(jnp.zeros_like, x_all)
        right = [(i, i + 1) for i in range(n_stages - 1)]

        for t in range(m + n_stages - 1):
            feed = take(x_all, t) if t < m else zeros
            inp = jax.tree.map(
                lambda f, r: jnp.where(is_first, f, r), feed, recv
            )
            y = stage_fn(params_s, inp)
            if right:
                recv = jax.tree.map(
                    lambda a: jax.lax.ppermute(a, axis, right), y
                )
            out_t = t - (n_stages - 1)
            if 0 <= out_t < m:
                outs = jax.tree.map(
                    lambda o, a: o.at[out_t].set(
                        jnp.where(is_last, a, o[out_t])
                    ),
                    outs, y,
                )

        # results live on the last stage only; psum-broadcast so the
        # shard_map output is replicated
        return jax.tree.map(
            lambda o: jax.lax.psum(
                jnp.where(is_last, o, jnp.zeros_like(o)), axis
            ),
            outs,
        )

    stage_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    payload_spec = jax.tree.map(lambda _: P(), payload_mb)
    mapped = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(stage_spec, payload_spec),
        out_specs=payload_spec,
        # only `pp` is manual: other mesh axes (data/model/sp) stay auto so
        # the schedule composes with a dp×pp trainer mesh
        axis_names={axis},
    )
    out_mb = mapped(stacked_params, payload_mb)
    return jax.tree.map(
        lambda a: a.reshape((b,) + a.shape[2:]), out_mb
    )


def pipeline_encoder_apply(
    cfg,
    layer_params: list,  # per-layer param trees (params["layer_0"], ...)
    x: jax.Array,  # [B, L, D]
    bias: jax.Array,  # additive bias, leading dim 1 or B
    mesh: Mesh,
    axis: str = "pp",
    num_microbatches: int = 0,
) -> jax.Array:
    """Pipeline a TransformerEncoder's layer stack over `axis`.

    Stages = contiguous layer groups (num_layers must divide by the stage
    count).  Equivalent to TransformerEncoder.__call__ with the same params
    (see tests/test_pipeline.py).  Materialise MaskSpec to a bias tensor
    first — the bias rows ride with their microbatch through the ring.
    """
    from vitxtgqa_tpu.models.common import TransformerLayer

    n_stages = mesh.shape[axis]
    n_layers = len(layer_params)
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    per_stage = n_layers // n_stages

    # parent=None keeps this a detached module: pipeline_encoder_apply may
    # run inside a bound TransformerEncoder (the set_pipeline hook), where
    # a plain constructor would trip flax's submodule registration
    layer = TransformerLayer(cfg, parent=None)
    stage_trees = [
        {f"sub_{j}": layer_params[s * per_stage + j] for j in range(per_stage)}
        for s in range(n_stages)
    ]
    stacked = stack_stage_params(stage_trees)

    b = x.shape[0]
    bias = jnp.broadcast_to(bias, (b,) + bias.shape[1:])

    def stage_fn(params_s, payload):
        h, bias_s = payload["h"], payload["bias"]
        for j in range(per_stage):
            h = layer.apply({"params": params_s[f"sub_{j}"]}, h, bias_s)
        return {"h": h, "bias": bias_s}

    out = gpipe(
        stage_fn, stacked, {"h": x, "bias": bias}, mesh, axis,
        num_microbatches,
    )
    return out["h"]
