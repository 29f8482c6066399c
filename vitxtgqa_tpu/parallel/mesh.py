"""Device mesh + sharding rules.

TPU-native replacement for the reference's DataParallel/DDP-over-NCCL
(reference: pythia/trainers/base_trainer.py:51-137, distributed_utils.py):
one `jax.sharding.Mesh` with a `data` axis (DP) and a `model` axis (TP);
gradients all-reduce inside the jitted step via XLA collectives over ICI —
no explicit reduce_dict/broadcast plumbing.

Param sharding: large matrices shard over `model` by a path-regex rule
table; everything else replicates.  With model=1 (the default) this
degenerates to pure DP and adds no collectives.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    data: int = -1,
    model: int = 1,
    sp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence[Any]] = None,
    batch_size: Optional[int] = None,
) -> Mesh:
    """Build a (data, model[, sp][, pp]) mesh.  When `batch_size` is given,
    the data axis shrinks to the largest divisor of the batch size (a mesh
    may use a subset of devices; better some idle chips than a shard error).
    An `sp` axis > 1 adds sequence parallelism (consumed by
    ops.attention.set_sequence_parallel); a `pp` axis > 1 adds GPipe
    pipeline stages over transformer layers (models.common.set_pipeline)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * sp * pp) == 0, (n, model, sp, pp)
        data = n // (model * sp * pp)
    if batch_size is not None:
        while data > 1 and batch_size % data != 0:
            data -= 1
    assert data * model * sp * pp <= n, (
        f"mesh {data}x{model}x{sp}x{pp} > {n} devices"
    )
    shape, names = [data, model], ["data", "model"]
    if sp > 1:
        shape.append(sp)
        names.append("sp")
    if pp > 1:
        shape.append(pp)
        names.append("pp")
    used = 1
    for s in shape:
        used *= s
    arr = np.array(devices[:used]).reshape(shape)
    return Mesh(arr, tuple(names))


# path-regex -> PartitionSpec for the weight's dimensions.
# MLP and attention projections shard their output (or input) features over
# `model`; embeddings shard the vocab dim; biases/LN replicate.
DEFAULT_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*ffn_in.*/kernel$", P(None, "model")),
    (r".*ffn_out.*/kernel$", P("model", None)),
    (r".*(query|key|value)/kernel$", P(None, "model")),
    (r".*attn_out/kernel$", P("model", None)),
    (r".*classifier/weight$", P("model", None)),
    (r".*word_embeddings/embedding$", P("model", None)),
)


def _tree_paths(tree) -> Dict[str, Any]:
    flat = {}

    def visit(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = node

    visit("", tree)
    return flat


def param_shardings(
    params: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = DEFAULT_PARAM_RULES,
) -> Any:
    """PartitionSpec pytree for `params` from the rule table.

    A rule only applies if the named axis divides the dimension it shards;
    otherwise the param replicates (keeps odd-sized heads/vocabs working on
    any mesh)."""
    model_size = mesh.shape.get("model", 1)

    def spec_for(path: str, leaf) -> P:
        if model_size > 1:
            for pattern, spec in rules:
                if re.match(pattern, path):
                    ok = True
                    for dim, axis in enumerate(spec):
                        if axis == "model" and leaf.shape[dim] % model_size != 0:
                            ok = False
                    if ok:
                        return spec
        return P()

    flat = _tree_paths(params)
    specs = {p: spec_for(p, leaf) for p, leaf in flat.items()}

    def rebuild(node, prefix=""):
        if isinstance(node, dict):
            return {
                k: rebuild(v, f"{prefix}/{k}" if prefix else k)
                for k, v in node.items()
            }
        return NamedSharding(mesh, specs[prefix])

    return rebuild(params)


def batch_shardings(tensors: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard every batch tensor's leading (batch) dim over `data`."""
    return {
        k: NamedSharding(mesh, P("data"))
        for k in tensors
    }


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
