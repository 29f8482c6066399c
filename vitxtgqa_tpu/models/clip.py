"""CLIP towers (ViT + ModifiedResNet) and the dual-encoder wrapper.

TPU-native re-implementation of the CLIP package the reference bundles for
MIST (reference: pythia/modules/mist_module/clip/model.py — Bottleneck :10,
AttentionPool2d :58, ModifiedResNet :94, VisionTransformer :206, CLIP :245,
build_model :402).  In the reference fork the tower is instantiated but
never invoked in the forward path; it is re-created here for full component
parity and to serve as an on-device image/text embedder.

Design notes (vs the torch original):
  * flax.linen modules with NHWC convs (XLA-preferred layout); the torch
    checkpoints' NCHW conv kernels are transposed by the converter below.
  * QuickGELU (x * sigmoid(1.702x)) and fp32 LayerNorms match the original.
  * Attention uses the shared fused path (jnp einsum / XLA fusion); the
    causal text mask is a static bias — no data-dependent control flow.
  * BatchNorm (ResNet tower) runs in inference mode with converted running
    statistics — CLIP is always frozen/eval in the reference (mist.py:452).
  * `build_clip_params(state_dict)` mirrors the reference's geometry
    inference from a torch state dict (model.py:402-439) and returns
    (CLIPConfig, flax params).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(x, scale, bias, eps=1e-5):
    """fp32 LayerNorm regardless of activation dtype (model.py:157-163)."""
    orig = x.dtype
    x = x.astype(jnp.float32)
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(orig)


class FP32LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return _ln(x, scale, bias, self.eps)


def _attention(q, k, v, num_heads, bias=None):
    """q [B,Lq,D], k/v [B,Lk,D] -> [B,Lq,D]; bias [Lq,Lk] additive."""
    b, lq, d = q.shape
    hd = d // num_heads
    qh = q.reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, k.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, v.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / (hd ** 0.5)
    if bias is not None:
        scores = scores + bias
    w = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, d)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block with QuickGELU MLP (model.py:171-192)."""

    d_model: int
    n_head: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        h = FP32LayerNorm(self.d_model, name="ln_1")(x)
        qkv = nn.Dense(3 * self.d_model, name="attn_in")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        bias = None
        if self.causal:
            l = x.shape[1]
            bias = jnp.where(
                jnp.tril(jnp.ones((l, l), bool)), 0.0, -jnp.inf
            ).astype(jnp.float32)
        attn = _attention(q, k, v, self.n_head, bias)
        x = x + nn.Dense(self.d_model, name="attn_out")(attn)
        h = FP32LayerNorm(self.d_model, name="ln_2")(x)
        h = nn.Dense(4 * self.d_model, name="c_fc")(h)
        h = nn.Dense(self.d_model, name="c_proj")(quick_gelu(h))
        return x + h


class CLIPTransformer(nn.Module):
    width: int
    layers: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, self.causal, name=f"resblock_{i}"
            )(x)
        return x


class CLIPVisionTransformer(nn.Module):
    """Patchify -> CLS -> pre-LN transformer -> CLS proj (model.py:206-242)."""

    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int

    @nn.compact
    def __call__(self, images):
        """images [B, H, W, 3] -> [B, output_dim]."""
        x = nn.Conv(
            self.width, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            use_bias=False, name="conv1",
        )(images)
        b = x.shape[0]
        x = x.reshape(b, -1, self.width)
        scale = self.width ** -0.5
        cls = self.param(
            "class_embedding", nn.initializers.normal(scale), (self.width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x], 1
        )
        n_tok = (self.input_resolution // self.patch_size) ** 2 + 1
        pos = self.param(
            "positional_embedding", nn.initializers.normal(scale),
            (n_tok, self.width),
        )
        x = x + pos.astype(x.dtype)
        x = FP32LayerNorm(self.width, name="ln_pre")(x)
        x = CLIPTransformer(self.width, self.layers, self.heads,
                            name="transformer")(x)
        x = FP32LayerNorm(self.width, name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj", nn.initializers.normal(scale), (self.width, self.output_dim)
        )
        return x @ proj.astype(x.dtype)


class Bottleneck(nn.Module):
    """Anti-aliased ResNet bottleneck (model.py:10-55); inference-mode BN."""

    inplanes: int
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, name=name
        )
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride),
                              (self.stride, self.stride))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = bn("bn3")(out)

        identity = x
        if self.stride > 1 or self.inplanes != self.planes * self.expansion:
            identity = nn.avg_pool(x, (self.stride, self.stride),
                                   (self.stride, self.stride)) \
                if self.stride > 1 else x
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1), use_bias=False,
                name="downsample_conv",
            )(identity)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Mean-token QKV attention pool (model.py:58-91)."""

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        """x [B, H, W, C] -> [B, output_dim]."""
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = jnp.concatenate([seq.mean(1, keepdims=True), seq], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim ** -0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim),
        )
        seq = seq + pos.astype(seq.dtype)
        q = nn.Dense(self.embed_dim, name="q_proj")(seq[:, :1])
        k = nn.Dense(self.embed_dim, name="k_proj")(seq)
        v = nn.Dense(self.embed_dim, name="v_proj")(seq)
        pooled = _attention(q, k, v, self.num_heads)
        return nn.Dense(self.output_dim or self.embed_dim,
                        name="c_proj")(pooled)[:, 0]


class ModifiedResNet(nn.Module):
    """3-conv stem + anti-aliased stages + attention pool (model.py:94-154)."""

    layers: Sequence[int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64

    @nn.compact
    def __call__(self, images):
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, name=name
        )
        x = nn.Conv(self.width // 2, (3, 3), strides=2, padding=1,
                    use_bias=False, name="conv1")(images)
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(self.width // 2, (3, 3), padding=1, use_bias=False,
                    name="conv2")(x)
        x = nn.relu(bn("bn2")(x))
        x = nn.Conv(self.width, (3, 3), padding=1, use_bias=False,
                    name="conv3")(x)
        x = nn.relu(bn("bn3")(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        inplanes = self.width
        for stage, (planes_mult, blocks) in enumerate(
            zip((1, 2, 4, 8), self.layers)
        ):
            planes = self.width * planes_mult
            stride = 1 if stage == 0 else 2
            for blk in range(blocks):
                x = Bottleneck(
                    inplanes, planes, stride if blk == 0 else 1,
                    name=f"layer{stage + 1}_{blk}",
                )(x)
                inplanes = planes * 4

        return AttentionPool2d(
            self.input_resolution // 32, self.width * 32, self.heads,
            self.output_dim, name="attnpool",
        )(x)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: Union[Tuple[int, int, int, int], int] = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.vision_layers, (tuple, list))


CLIP_VIT_B_32 = CLIPConfig()  # the geometry MIST loads (mist.py:452)
CLIP_RN50 = CLIPConfig(
    embed_dim=1024, vision_layers=(3, 4, 6, 3), vision_width=64,
    vision_patch_size=0,
)


class CLIP(nn.Module):
    """Dual encoder (model.py:245-375)."""

    cfg: CLIPConfig

    def setup(self):
        c = self.cfg
        if c.is_resnet:
            heads = c.vision_width * 32 // 64
            self.visual = ModifiedResNet(
                layers=tuple(c.vision_layers), output_dim=c.embed_dim,
                heads=heads, input_resolution=c.image_resolution,
                width=c.vision_width,
            )
        else:
            heads = c.vision_width // 64
            self.visual = CLIPVisionTransformer(
                input_resolution=c.image_resolution,
                patch_size=c.vision_patch_size, width=c.vision_width,
                layers=int(c.vision_layers), heads=heads,
                output_dim=c.embed_dim,
            )
        self.transformer = CLIPTransformer(
            c.transformer_width, c.transformer_layers, c.transformer_heads,
            causal=True,
        )
        self.token_embedding = nn.Embed(c.vocab_size, c.transformer_width)
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (c.context_length, c.transformer_width),
        )
        self.ln_final = FP32LayerNorm(c.transformer_width)
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(c.transformer_width ** -0.5),
            (c.transformer_width, c.embed_dim),
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda *_: jnp.asarray(np.log(1 / 0.07), jnp.float32), (),
        )

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, text):
        """text [B, L] int ids -> (eot-pooled [B, E], per-word [B, L, E]).

        EOT pooling = feature at the argmax token id, matching the
        reference's highest-id convention (model.py:355-357).
        """
        x = self.token_embedding(text)
        x = x + self.positional_embedding.astype(x.dtype)
        x = self.transformer(x)
        x = self.ln_final(x)
        x_word = x @ self.text_projection.astype(x.dtype)
        eot = jnp.argmax(text, axis=-1)
        pooled = jnp.take_along_axis(
            x_word, eot[:, None, None], axis=1
        )[:, 0]
        return pooled, x_word

    def __call__(self, images, text):
        img = self.encode_image(images)
        txt, _ = self.encode_text(text)
        img = img / jnp.linalg.norm(img, axis=1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


# ---------------------------------------------------------------------------
# torch state-dict conversion (geometry inference mirrors model.py:402-439)
# ---------------------------------------------------------------------------


def infer_clip_config(sd: Dict[str, np.ndarray]) -> CLIPConfig:
    vit = "visual.proj" in sd
    if vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [k for k in sd
             if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = [
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        ]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5
        )
        vision_patch_size = 0
        image_resolution = out_width * 32
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len(
            {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
        ),
    )


def _conv(w):  # [O, I, kh, kw] -> [kh, kw, I, O]
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):  # [out, in] -> [in, out]
    return np.transpose(w)


def _block_params(sd, p):
    """One ResidualAttentionBlock's params from torch prefix ``p``."""
    return {
        "ln_1": {"scale": sd[f"{p}.ln_1.weight"], "bias": sd[f"{p}.ln_1.bias"]},
        "attn_in": {
            "kernel": _lin(sd[f"{p}.attn.in_proj_weight"]),
            "bias": sd[f"{p}.attn.in_proj_bias"],
        },
        "attn_out": {
            "kernel": _lin(sd[f"{p}.attn.out_proj.weight"]),
            "bias": sd[f"{p}.attn.out_proj.bias"],
        },
        "ln_2": {"scale": sd[f"{p}.ln_2.weight"], "bias": sd[f"{p}.ln_2.bias"]},
        "c_fc": {"kernel": _lin(sd[f"{p}.mlp.c_fc.weight"]),
                 "bias": sd[f"{p}.mlp.c_fc.bias"]},
        "c_proj": {"kernel": _lin(sd[f"{p}.mlp.c_proj.weight"]),
                   "bias": sd[f"{p}.mlp.c_proj.bias"]},
    }


def _bn_split(sd, p):
    """torch BN -> (params, batch_stats)."""
    return (
        {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]},
        {"mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"]},
    )


def build_clip_params(sd: Dict[str, np.ndarray]):
    """torch CLIP state dict -> (CLIPConfig, {'params':…, 'batch_stats':…}).

    The variables load into ``CLIP(cfg).apply`` directly; numerically matches
    the torch model (see tests/test_clip_parity.py).
    """
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if k not in ("input_resolution", "context_length", "vocab_size")}
    cfg = infer_clip_config(sd)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if cfg.is_resnet:
        vis: Dict[str, Any] = {}
        vis_stats: Dict[str, Any] = {}
        for i in (1, 2, 3):
            vis[f"conv{i}"] = {"kernel": _conv(sd[f"visual.conv{i}.weight"])}
            p, s = _bn_split(sd, f"visual.bn{i}")
            vis[f"bn{i}"], vis_stats[f"bn{i}"] = p, s
        for stage in (1, 2, 3, 4):
            blk = 0
            while f"visual.layer{stage}.{blk}.conv1.weight" in sd:
                tp = f"visual.layer{stage}.{blk}"
                fp = f"layer{stage}_{blk}"
                bp: Dict[str, Any] = {}
                bs: Dict[str, Any] = {}
                for j in (1, 2, 3):
                    bp[f"conv{j}"] = {"kernel": _conv(sd[f"{tp}.conv{j}.weight"])}
                    p, s = _bn_split(sd, f"{tp}.bn{j}")
                    bp[f"bn{j}"], bs[f"bn{j}"] = p, s
                if f"{tp}.downsample.0.weight" in sd:
                    bp["downsample_conv"] = {
                        "kernel": _conv(sd[f"{tp}.downsample.0.weight"])
                    }
                    p, s = _bn_split(sd, f"{tp}.downsample.1")
                    bp["downsample_bn"], bs["downsample_bn"] = p, s
                vis[fp], vis_stats[fp] = bp, bs
                blk += 1
        ap = "visual.attnpool"
        vis["attnpool"] = {
            "positional_embedding": sd[f"{ap}.positional_embedding"],
            "q_proj": {"kernel": _lin(sd[f"{ap}.q_proj.weight"]),
                       "bias": sd[f"{ap}.q_proj.bias"]},
            "k_proj": {"kernel": _lin(sd[f"{ap}.k_proj.weight"]),
                       "bias": sd[f"{ap}.k_proj.bias"]},
            "v_proj": {"kernel": _lin(sd[f"{ap}.v_proj.weight"]),
                       "bias": sd[f"{ap}.v_proj.bias"]},
            "c_proj": {"kernel": _lin(sd[f"{ap}.c_proj.weight"]),
                       "bias": sd[f"{ap}.c_proj.bias"]},
        }
        params["visual"] = vis
        stats["visual"] = vis_stats
    else:
        vis = {
            "conv1": {"kernel": _conv(sd["visual.conv1.weight"])},
            "class_embedding": sd["visual.class_embedding"],
            "positional_embedding": sd["visual.positional_embedding"],
            "ln_pre": {"scale": sd["visual.ln_pre.weight"],
                       "bias": sd["visual.ln_pre.bias"]},
            "ln_post": {"scale": sd["visual.ln_post.weight"],
                        "bias": sd["visual.ln_post.bias"]},
            "proj": sd["visual.proj"],
            "transformer": {
                f"resblock_{i}": _block_params(
                    sd, f"visual.transformer.resblocks.{i}"
                )
                for i in range(int(cfg.vision_layers))
            },
        }
        params["visual"] = vis

    params["transformer"] = {
        f"resblock_{i}": _block_params(sd, f"transformer.resblocks.{i}")
        for i in range(cfg.transformer_layers)
    }
    params["token_embedding"] = {"embedding": sd["token_embedding.weight"]}
    params["positional_embedding"] = sd["positional_embedding"]
    params["ln_final"] = {"scale": sd["ln_final.weight"],
                          "bias": sd["ln_final.bias"]}
    params["text_projection"] = sd["text_projection"]
    params["logit_scale"] = sd["logit_scale"].reshape(())

    variables: Dict[str, Any] = {
        "params": jax.tree.map(jnp.asarray, params)
    }
    if stats:
        variables["batch_stats"] = jax.tree.map(jnp.asarray, stats)
    return cfg, variables


def load_clip(path: str):
    """torch .pt/.pth checkpoint -> (CLIP module, variables).

    Equivalent of clip.load(..., jit=False) (reference: clip/clip.py) minus
    the TorchScript path: always builds from the state dict.
    """
    from vitxtgqa_tpu.utils.torch_convert import load_state_dict

    cfg, variables = build_clip_params(load_state_dict(path))
    return CLIP(cfg), variables
