"""Driver-contract tests: entry() compiles under eval_shape; the multichip
dry run executes a full sharded train step on 8 virtual CPU devices."""

import jax
import pytest


def test_entry_shapes():
    import __graft_entry__ as g

    fn, (params, batch) = g.entry()
    out = jax.eval_shape(fn, params, batch)
    assert out["pos_scores"].shape == (2, 12, 5050 + 960)
    assert out["ground_frame"].shape == (2, 5)
    assert out["ground_box"].shape == (2, 64 * 5, 4)


@pytest.mark.slow
def test_dryrun_multichip_8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (conftest sets the XLA flag)")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any sharding/compile failure
