"""T2S model tests: shapes, gradient flow, KV-cache decode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitxtgqa_tpu.core.config import ConfigNode
from vitxtgqa_tpu.models.t2s import T2S

# tiny geometry: F frames, K ocr/frame, N=F*K ocr slots, S decode steps
F, K, S, T = 8, 3, 4, 6
N = F * K
NV = 17  # fixed vocab size
VF, FT, PH = 32, 16, 24  # video-feat, fasttext, phoc dims


def tiny_config():
    tl = {"hidden_size": 64, "num_hidden_layers": 1, "num_attention_heads": 4,
          "intermediate_size": 128}
    return ConfigNode(
        {
            "text_bert": {**tl, "num_hidden_layers": 1, "vocab_size": 100,
                          "max_position_embeddings": 32},
            "obj": {"mmt_in_dim": VF + 50, "dropout_prob": 0.1},
            "ocr": {"mmt_in_dim": FT + PH + 100, "dropout_prob": 0.1},
            "translayers": dict(tl),
            "grounding": {
                "frame_topk": 2, "ocr_topk": 2, "max_ocr_num": N,
                "frame_num": F, "ocr_frame_num": K, "hidden_size": 64,
            },
            "encoder": dict(tl),
            "mmt": {**tl, "num_hidden_layers": 2},
            "classifier": {
                "type": "linear", "ocr_max_num": N,
                "ocr_ptr_net": {"hidden_size": 64, "query_key_size": 64},
                "params": {},
            },
        }
    )


def tiny_batch(rng, b=2):
    r = np.random.default_rng(rng)
    frame_num = np.array([F, F - 2])
    frame_id = np.zeros((b, F), np.int32)
    frame_mask = np.zeros((b, F), np.float32)
    temporal = np.zeros((b, N), np.int32)
    for i in range(b):
        n = frame_num[i]
        frame_id[i, :n] = np.arange(1, n + 1)
        frame_mask[i, :n] = 1
        for f in range(F):
            temporal[i, f * K : (f + 1) * K] = frame_id[i, f] if f < n else 0
    ocr_mask = (r.random((b, N)) > 0.3).astype(np.float32)
    ocr_mask *= (temporal > 0).astype(np.float32)
    targets = np.zeros((b, S, NV + N), np.float32)
    targets[:, 0, 5] = 1.0
    prev = np.zeros((b, S), np.int64)
    prev[:, 0] = 2
    return {
        "text": r.integers(1, 90, (b, T)),
        "text_len": np.array([T, T - 2]),
        "video_feat": r.standard_normal((b, F, VF)).astype(np.float32),
        "frame_id": frame_id,
        "frame_mask": frame_mask,
        "temporal_id": temporal,
        "track_id": r.integers(0, 10, (b, N)),
        "ocr_mask": ocr_mask,
        "context_feature_0": r.standard_normal((b, N, FT)).astype(np.float32),
        "context_feature_1": (r.random((b, N, PH)) > 0.5).astype(np.float32),
        "ocr_bbox_coordinates": r.random((b, N, 4)).astype(np.float32),
        "train_prev_inds": prev,
        "train_loss_mask": np.tile([1, 1, 0, 0], (b, 1)).astype(np.float32),
        "targets": targets,
    }


@pytest.fixture(scope="module")
def model_and_vars():
    model = T2S(config=tiny_config(), num_final_outputs=NV + N, bos_idx=2)
    batch = tiny_batch(0)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)
    return model, variables, batch


def test_train_forward_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    out = model.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.key(3), "gumbel": jax.random.key(4)},
    )
    for k in ("ref_scores", "pos_scores", "neg_scores"):
        assert out[k].shape == (2, S, NV + N)
    assert out["ground_frame"].shape == (2, 2)
    assert out["ground_box"].shape == (2, F * 2, 4)
    # grounded frames are real (non-padding) frame ids
    assert (out["ground_frame"] >= 1).all()


def test_eval_forward_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    out = model.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(7)}
    )
    assert out["pos_scores"].shape == (2, S, NV + N)


def test_eval_cached_decode_matches_recompute(model_and_vars):
    model, variables, batch = model_and_vars
    fast = model.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(11)}
    )
    slow_model = T2S(
        config=tiny_config(), num_final_outputs=NV + N, bos_idx=2,
        decode_recompute=True,
    )
    slow = slow_model.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(11)}
    )
    np.testing.assert_array_equal(
        np.asarray(fast["ground_frame"]), np.asarray(slow["ground_frame"])
    )
    for k in ("pos_scores", "ref_scores", "neg_scores"):
        np.testing.assert_allclose(
            np.asarray(fast[k]), np.asarray(slow[k]), rtol=2e-4, atol=2e-4,
            err_msg=k,
        )


def test_loss_and_grads_finite(model_and_vars):
    from vitxtgqa_tpu.losses import Losses

    model, variables, batch = model_and_vars
    losses = Losses(
        [{"type": "pos_bce_loss", "weight": 1.0}, {"type": "InfoNCE", "weight": 1000}]
    )

    def loss_fn(params):
        out = model.apply(
            {"params": params}, batch, train=True,
            rngs={"dropout": jax.random.key(5), "gumbel": jax.random.key(6)},
        )
        total, _ = losses.total(batch, out)
        return total

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # mmt/classifier train
    for key in ("mmt", "classifier", "qtv", "text_bert"):
        norm = sum(
            float(jnp.abs(g).sum())
            for g in jax.tree_util.tree_leaves(grads[key])
        )
        assert norm > 0, key
    # faithful reference property: the grounding indicator emits only hard
    # masks/indices (scatter + no-grad attention masks,
    # spatio_temporal_grounding.py:52-65, t2s.py:619 asserts no mask grad),
    # so its parameters receive zero gradient
    gnorm = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["grounding"])
    )
    assert gnorm == 0


def test_split_dense_matches_concat_dense():
    """split_dense + inv_l2_norm reproduce dense(concat(l2norm(a), b))
    without materialising the concat (models/base.py helpers used by
    T2S._encode_modalities)."""
    from flax import linen as nn

    from vitxtgqa_tpu.models.base import inv_l2_norm, l2_normalize, split_dense

    class Mod(nn.Module):
        @nn.compact
        def __call__(self, a, b, naive: bool):
            dense = nn.Dense(32, name="proj")
            if naive:
                return dense(jnp.concatenate([l2_normalize(a), b], axis=-1))
            return split_dense(
                dense, [a, b], [inv_l2_norm(a), None], a.dtype
            )

    r = jax.random.split(jax.random.key(3), 2)
    a = jax.random.normal(r[0], (2, 7, 24))
    b = jax.random.normal(r[1], (2, 7, 8))
    mod = Mod()
    variables = mod.init(jax.random.key(0), a, b, True)
    want = mod.apply(variables, a, b, True)
    got = mod.apply(variables, a, b, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    # grads flow through the split path into the shared kernel
    g = jax.grad(
        lambda v: mod.apply(v, a, b, False).sum()
    )(variables)["params"]["proj"]["kernel"]
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
