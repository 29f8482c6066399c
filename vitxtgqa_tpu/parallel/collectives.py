"""Cross-device/host communication helpers.

TPU-native replacement for the reference's NCCL helper layer
(reference: pythia/utils/distributed_utils.py:7-110):

  reference                      | here
  -------------------------------+------------------------------------------
  synchronize (barrier)          | multihost_utils.sync_global_devices
  broadcast_scalar rank0->all    | multihost_utils.broadcast_one_to_all
  reduce_dict (÷ world size)     | pmean_dict — in-graph psum over the mesh
                                 | data axis (XLA emits the ICI all-reduce)
  gather_tensor (eval artifacts) | process_allgather
  pickle->uint8 object transport | utils/bytes.py (only needed for multihost
                                 | string gathers; single-host keeps strings
                                 | on the host side, no tensor detour)

Gradient all-reduce needs no helper at all: the jitted train step is sharded
over the mesh and XLA inserts the collective (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize(name: str = "sync") -> None:
    """Global barrier across hosts (no-op single-host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def broadcast_scalar(value, source: int = 0):
    """Host-level scalar broadcast (reference: distributed_utils.py:21-38,
    used for the early-stop decision, base_trainer.py:375)."""
    if jax.process_count() <= 1:
        return value
    from jax.experimental import multihost_utils

    arr = jnp.asarray(value)
    return multihost_utils.broadcast_one_to_all(arr).item()


def pmean_dict(values: Dict[str, Any], axis_name: str = "data") -> Dict[str, Any]:
    """In-graph mean over the mesh data axis — call inside shard_map/pjit
    (reference reduce_dict: distributed_utils.py:91-110)."""
    return {k: jax.lax.pmean(v, axis_name) for k, v in values.items()}


def host_mean_dict(values: Dict[str, float]) -> Dict[str, float]:
    """Host-level metric averaging across processes (eval-time, outside jit)."""
    if jax.process_count() <= 1:
        return values
    from jax.experimental import multihost_utils

    keys = sorted(values)
    arr = jnp.asarray([float(values[k]) for k in keys])
    summed = multihost_utils.process_allgather(arr).sum(axis=0)
    return {
        k: float(v) / jax.process_count() for k, v in zip(keys, summed)
    }


def gather_objects(obj: Any) -> list:
    """All-gather arbitrary host objects across processes via the uint8
    transport (reference: objects_to_byte_tensor.py + test_reporter.py
    prediction gather).  Returns the list of every process's object."""
    if jax.process_count() <= 1:
        return [obj]
    from jax.experimental import multihost_utils

    from vitxtgqa_tpu.utils.bytes import dec_bytes2obj, enc_obj2bytes

    payload = enc_obj2bytes(obj, max_size=8 * 1024 * 1024)
    gathered = multihost_utils.process_allgather(jnp.asarray(payload))
    return [dec_bytes2obj(row) for row in gathered]
