"""Test harness setup.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic can
be exercised without TPU hardware (SURVEY.md §4).  Must be set before jax
initialises its backends, hence the os.environ writes at import time.
"""

import os

# Force CPU: the outer environment pins JAX_PLATFORMS=axon (the tunnelled TPU
# chip), which would make every test compile over the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize registers the axon TPU backend and overwrites
# jax_platforms at interpreter start — env vars alone don't win.  Re-pin it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _reset_trace_time_globals():
    """Serving/training mode switches are process-wide trace-time globals
    (set_compact_serving, set_kv_cache_int8, set_w8a8, set_remat, ...); a
    test that flips one (directly or through the trainer's config knobs)
    must not leak it into later tests — e.g. a leaked compact_serving
    flag makes test_inference_only compare compacted vs full scores."""
    yield
    from vitxtgqa_tpu.models import common as _common
    from vitxtgqa_tpu.ops import attention as _attention

    _common.set_compact_serving(False)
    _common.set_compact_train(False)
    _common.set_kv_cache_int8(False)
    _common.set_fused_decode(True)
    _common.set_fused_decode_max_batch(
        _common.DEFAULT_FUSED_DECODE_MAX_BATCH
    )
    _common.set_fused_grads(False)
    _common.set_fused_block_bwd(False)
    from vitxtgqa_tpu.ops import pallas_block_bwd as _pbb

    _pbb.set_block_recompute_fwd(False)
    _pbb.set_kernel_dropout(False)
    _attention.set_use_pallas(False)
    _common.set_remat(False)
    _common.set_pipeline(None)
    _attention.set_w8a8(False)
    _attention.set_decode_pallas(True)
    _attention.set_sequence_parallel(None)
    from vitxtgqa_tpu.metrics import evaluators as _evaluators

    _evaluators.set_reference_compat(False)
