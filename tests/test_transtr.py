"""TranSTR + differentiable top-k tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vitxtgqa_tpu.ops import diff_topk as DT


def test_hard_topk_indicator():
    x = jnp.asarray([[0.1, 0.9, 0.5, 0.3]])
    ind = DT.hard_topk_indicator(x, 2)  # [1, 4, 2]
    assert ind.shape == (1, 4, 2)
    # columns one-hot the top entries (0.9 then 0.5)
    assert ind[0, 1, 0] == 1 and ind[0, 2, 1] == 1
    assert ind.sum() == 2


def test_perturbed_topk_forward_approaches_hard():
    x = jnp.asarray([[0.0, 10.0, -5.0, 8.0, 1.0]])
    ind = DT.perturbed_topk(x, jax.random.key(0), 2, num_samples=200, sigma=0.05)
    # with well-separated scores the expectation is ~the hard indicator
    hard = DT.hard_topk_indicator(x, 2)
    # ordering differs (perturbed sorts indices ascending); compare row sums
    np.testing.assert_allclose(
        np.asarray(ind.sum(-1)), np.asarray(hard.sum(-1)), atol=0.05
    )


def test_perturbed_topk_gradient_nonzero_and_finite():
    x = jnp.asarray([[0.5, 0.4, 0.45, 0.42]])

    def f(x):
        ind = DT.perturbed_topk(x, jax.random.key(1), 2, num_samples=300)
        return (ind[:, :, 0] * jnp.arange(4)).sum()

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_sinkhorn_topk_mass():
    x = jnp.asarray([[0.0, 5.0, 1.0, 4.0, 0.5]])
    a = DT.sinkhorn_topk(x, 2, epsilon=0.05, max_iter=300)
    assert a.shape == (1, 5, 2)
    sel = np.asarray(a[:, :, 0])
    # the two highest scores should carry the most transport mass
    assert sel[0, 1] > sel[0, 0] and sel[0, 3] > sel[0, 4]


def test_sine_position_embedding():
    pos = DT.sine_position_embedding(jnp.ones((2, 8)), 64)
    assert pos.shape == (2, 8, 64)
    assert np.isfinite(np.asarray(pos)).all()
    # positions differ along the sequence
    assert np.abs(np.asarray(pos[0, 0] - pos[0, 7])).max() > 0.1


def test_transtr_model():
    from vitxtgqa_tpu.models.transtr import TranSTR
    from vitxtgqa_tpu.utils.synthetic import synthetic_batch, tiny_model_config

    FRAMES, OPF = 8, 3
    N = FRAMES * OPF
    NUM_FINAL = 32 + N
    cfg = tiny_model_config(hidden=64, frames=FRAMES, ocr_per_frame=OPF)
    batch = synthetic_batch(
        batch=2, frames=FRAMES, ocr_per_frame=OPF, dec_steps=4, text_len=10,
        video_feat_dim=32, fasttext_dim=16, phoc_dim=24,
        num_final_outputs=NUM_FINAL, text_vocab=128,
    )
    model = TranSTR(config=cfg, num_final_outputs=NUM_FINAL, bos_idx=2)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2)}
    variables = model.init(rngs, batch, train=True)
    train_out = model.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.key(3), "gumbel": jax.random.key(4)},
    )
    assert train_out["pos_scores"].shape == (2, 4, NUM_FINAL)
    eval_out = model.apply(
        variables, batch, train=False, rngs={"gumbel": jax.random.key(5)}
    )
    assert eval_out["pos_scores"].shape == (2, 4, NUM_FINAL)
    assert eval_out["ground_frame"].shape == (2, 2)
    assert eval_out["ground_box"].shape == (2, 4, 4)  # kf*ko = 4
    assert np.isfinite(np.asarray(eval_out["pos_scores"])).all()

    # gradients flow through the perturbed top-k into the selector
    from vitxtgqa_tpu.losses import Losses

    losses = Losses([{"type": "pos_bce_loss", "weight": 1.0}])

    def loss_fn(p):
        out = model.apply(
            {"params": p}, batch, train=True,
            rngs={"dropout": jax.random.key(6), "gumbel": jax.random.key(7)},
        )
        total, _ = losses.total(batch, out)
        return total

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["selector"])
    )
    assert np.isfinite(gnorm) and gnorm > 0
