"""Numeric parity of the flax ViT vs HF ViTModel on converted weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitxtgqa_tpu.models.vit import ViT, ViTConfig
from vitxtgqa_tpu.utils.torch_convert import convert_vit_state


@pytest.mark.slow
def test_vit_matches_hf():
    torch = pytest.importorskip("torch")
    try:
        from transformers import ViTConfig as HFViTConfig, ViTModel
    except ImportError:
        pytest.skip("transformers unavailable")

    cfg = ViTConfig(
        image_size=32, patch_size=16, hidden_size=48, num_layers=2,
        num_heads=4, mlp_dim=96, ln_eps=1e-12,
    )
    hf_cfg = HFViTConfig(
        image_size=32, patch_size=16, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12, attn_implementation="eager",
    )
    torch.manual_seed(0)
    tmodel = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    jparams = convert_vit_state(sd, cfg)

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        want = tmodel(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    jmodel = ViT(cfg)
    init = jmodel.init(jax.random.key(0), jnp.asarray(images))["params"]
    from vitxtgqa_tpu.utils.torch_convert import convert_into_params, flatten

    merged = convert_into_params(flatten(jparams), init)
    cls, tokens = jmodel.apply({"params": merged}, jnp.asarray(images))
    got = np.concatenate([np.asarray(cls)[:, None, :], np.asarray(tokens)], 1)
    np.testing.assert_allclose(got, want, atol=3e-5)
