"""Vision Transformer for on-device frame-feature extraction.

TPU-native replacement for the reference's offline HF ViT pipeline
(reference: tools/video_feat/obtain_vit_feat.py:13-53 — ViT-L/16-224-in21k,
CLS token -> [1, 1024] npy per frame).  Instead of a per-frame CPU forward,
frames batch through one jitted pjit-able graph; weights can be converted
from a torch checkpoint (vitxtgqa_tpu/utils/torch_convert.py).

Also provides the CLIP-style ViT-B/32 geometry used by the reference's
bundled (but never invoked) CLIP tower, so both presets live behind one
module.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitxtgqa_tpu.ops.attention import merge_heads, mha, split_heads


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    dropout: float = 0.0
    ln_eps: float = 1e-12
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


VIT_L_16 = ViTConfig()  # the reference's feature extractor
VIT_B_32 = ViTConfig(
    patch_size=32, hidden_size=768, num_layers=12, num_heads=12, mlp_dim=3072,
    ln_eps=1e-5,
)  # CLIP tower geometry


class ViTEncoderLayer(nn.Module):
    """Pre-LN transformer block (ViT/CLIP style)."""

    cfg: ViTConfig

    def setup(self):
        c = self.cfg
        self.ln1 = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ln1")
        self.query = nn.Dense(c.hidden_size, dtype=c.dtype, name="query")
        self.key = nn.Dense(c.hidden_size, dtype=c.dtype, name="key")
        self.value = nn.Dense(c.hidden_size, dtype=c.dtype, name="value")
        self.attn_out = nn.Dense(c.hidden_size, dtype=c.dtype, name="attn_out")
        self.ln2 = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ln2")
        self.mlp_in = nn.Dense(c.mlp_dim, dtype=c.dtype, name="mlp_in")
        self.mlp_out = nn.Dense(c.hidden_size, dtype=c.dtype, name="mlp_out")

    def _mlp(self, h, deterministic: bool = True):
        from vitxtgqa_tpu.ops.attention import _on_tpu, pallas_enabled
        from vitxtgqa_tpu.ops.pallas_ffn import ffn_kernel_ok, fused_ffn

        c = self.cfg
        rows = 1
        for s in h.shape[:-1]:
            rows *= s
        # same fused matmul-gelu-matmul kernel as the QA transformers: the
        # mlp_dim intermediate (4096-wide for ViT-L) stays in VMEM.
        # Eval-only, mirroring TransformerLayer._fused_block_ok: under
        # remat the custom-VJP forward is triple-computed in training
        if (
            deterministic
            and not self.is_initializing()
            and pallas_enabled()
            and _on_tpu()
            and ffn_kernel_ok(c.hidden_size, c.mlp_dim, rows)
        ):
            p_in = self.mlp_in.variables["params"]
            p_out = self.mlp_out.variables["params"]
            return fused_ffn(
                h, p_in["kernel"], p_in["bias"], p_out["kernel"],
                p_out["bias"],
            )
        return self.mlp_out(nn.gelu(self.mlp_in(h), approximate=False))

    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        h = self.ln1(x)
        q = split_heads(self.query(h), c.num_heads)
        k = split_heads(self.key(h), c.num_heads)
        v = split_heads(self.value(h), c.num_heads)
        attn = self.attn_out(merge_heads(mha(q, k, v)))
        x = x + attn
        return x + self._mlp(self.ln2(x), deterministic)


class ViT(nn.Module):
    """Patchify -> CLS+pos embed -> pre-LN encoder -> final LN."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        """images [B, H, W, 3] float in model-normalised space ->
        (cls [B, D], tokens [B, P, D])."""
        c = self.cfg
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            dtype=c.dtype, name="patch_embed",
        )(images)
        b = x.shape[0]
        x = x.reshape(b, -1, c.hidden_size)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.hidden_size)
        ).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.hidden_size)), x], 1)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, c.num_patches + 1, c.hidden_size),
        ).astype(x.dtype)
        x = x + pos
        for i in range(c.num_layers):
            x = ViTEncoderLayer(c, name=f"layer_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="ln_final")(x)
        return x[:, 0], x[:, 1:]


# ImageNet-21k ViT preprocessing (reference extractor used ViTImageProcessor
# defaults: resize 224, scale 1/255, normalise mean/std 0.5)
IMAGENET_MEAN = 0.5
IMAGENET_STD = 0.5


def preprocess_frames(frames_uint8: jax.Array, size: int = 224) -> jax.Array:
    """[B, H, W, 3] uint8 -> resized, normalised float32 (on device)."""
    x = frames_uint8.astype(jnp.float32) / 255.0
    x = jax.image.resize(
        x, (x.shape[0], size, size, 3), method="bilinear"
    )
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def make_feature_extractor(cfg: ViTConfig = VIT_L_16, params: Optional[Any] = None,
                           rng: Optional[jax.Array] = None):
    """Returns (jitted_fn, params): frames uint8 [B,H,W,3] -> CLS [B, D]."""
    model = ViT(cfg)
    if params is None:
        rng = rng if rng is not None else jax.random.key(0)
        dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        params = model.init(rng, dummy)["params"]

    @jax.jit
    def extract(params, frames_uint8):
        images = preprocess_frames(frames_uint8, cfg.image_size)
        cls, _ = model.apply({"params": params}, images)
        return cls

    return extract, params
