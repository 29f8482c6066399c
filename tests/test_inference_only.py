"""inference_only serving path produces identical pos_scores + grounding."""

import sys, os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def test_inference_only_matches_triple_pass():
    from test_t2s_model import tiny_config, tiny_batch, NV, N
    from vitxtgqa_tpu.models.t2s import T2S

    batch = tiny_batch(0)
    full = T2S(config=tiny_config(), num_final_outputs=NV + N, bos_idx=2)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = full.init(rngs, batch, train=True)

    serving = T2S(config=tiny_config(), num_final_outputs=NV + N, bos_idx=2,
                  inference_only=True)
    out_full = full.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(9)}
    )
    out_serv = serving.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(9)}
    )
    assert "ref_scores" not in out_serv
    np.testing.assert_allclose(
        np.asarray(out_full["pos_scores"]), np.asarray(out_serv["pos_scores"]),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out_full["ground_frame"]), np.asarray(out_serv["ground_frame"])
    )
    np.testing.assert_allclose(
        np.asarray(out_full["ground_box"]), np.asarray(out_serv["ground_box"]),
        atol=1e-6,
    )


def test_variant_scan_matches_folded_train_path():
    """lax.scan-over-variants training gives identical scores to the folded
    3B batch when dropout is off."""
    from test_t2s_model import tiny_config, tiny_batch, NV, N
    from vitxtgqa_tpu.models.t2s import T2S

    batch = tiny_batch(0)
    cfg = tiny_config()
    cfg["obj"]["dropout_prob"] = 0.0
    cfg["ocr"]["dropout_prob"] = 0.0
    for key in ("text_bert", "translayers", "encoder", "mmt"):
        cfg[key]["hidden_dropout_prob"] = 0.0
        cfg[key]["attention_probs_dropout_prob"] = 0.0
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    fold = T2S(config=cfg, num_final_outputs=NV + N, bos_idx=2)
    variables = fold.init(rngs, batch, train=True)
    scan = T2S(config=cfg, num_final_outputs=NV + N, bos_idx=2,
               train_variant_scan=True)
    run_rngs = {"dropout": jax.random.key(5), "gumbel": jax.random.key(6)}
    out_f = fold.apply(variables, batch, train=True, rngs=run_rngs)
    out_s = scan.apply(variables, batch, train=True, rngs=run_rngs)
    for k in ("ref_scores", "pos_scores", "neg_scores"):
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_s[k]), atol=1e-5, err_msg=k
        )
