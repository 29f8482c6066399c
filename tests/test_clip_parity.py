"""Head-to-head parity of the flax CLIP towers vs the reference's bundled
torch CLIP (reference: pythia/modules/mist_module/clip/model.py), on
randomly initialised small geometries with converted weights.

Skipped when the reference tree isn't mounted.
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MODEL = "/root/reference/pythia/modules/mist_module/clip/model.py"


def _load_ref_clip():
    if not os.path.exists(REF_MODEL):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_clip_model", REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def ref():
    return _load_ref_clip()


def _compare(ref_model, images_nchw, text):
    from vitxtgqa_tpu.models.clip import CLIP, build_clip_params

    cfg, variables = build_clip_params(_np_sd(ref_model))
    model = CLIP(cfg)

    with torch.no_grad():
        t_img = ref_model.encode_image(torch.from_numpy(images_nchw)).numpy()
        t_txt, t_word = ref_model.encode_text(torch.from_numpy(text))
        t_txt, t_word = t_txt.numpy(), t_word.numpy()

    images_nhwc = np.transpose(images_nchw, (0, 2, 3, 1))
    j_img = np.asarray(
        model.apply(variables, images_nhwc, method=CLIP.encode_image)
    )
    j_txt, j_word = model.apply(
        variables, torch.from_numpy(text).numpy(), method=CLIP.encode_text
    )
    np.testing.assert_allclose(j_img, t_img, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_txt), t_txt, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_word), t_word, atol=2e-4, rtol=1e-3)


def test_clip_vit_parity(ref):
    torch.manual_seed(0)
    model = ref.CLIP(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=16, context_length=12, vocab_size=50,
        transformer_width=128, transformer_heads=2, transformer_layers=2,
    ).eval()
    rng = np.random.RandomState(0)
    images = rng.randn(3, 3, 32, 32).astype(np.float32)
    text = rng.randint(0, 50, size=(3, 12)).astype(np.int64)
    _compare(model, images, text)


def test_clip_resnet_parity(ref):
    torch.manual_seed(1)
    model = ref.CLIP(
        embed_dim=32, image_resolution=32, vision_layers=(1, 1, 1, 1),
        vision_width=16, vision_patch_size=None, context_length=10,
        vocab_size=40, transformer_width=128, transformer_heads=2,
        transformer_layers=1,
    ).eval()
    # randomise BN running stats so the conversion of running_mean/var is
    # actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    rng = np.random.RandomState(1)
    images = rng.randn(2, 3, 32, 32).astype(np.float32)
    text = rng.randint(0, 40, size=(2, 10)).astype(np.int64)
    _compare(model, images, text)


def test_clip_logits_parity(ref):
    from vitxtgqa_tpu.models.clip import CLIP, build_clip_params

    torch.manual_seed(2)
    model = ref.CLIP(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=16, context_length=12, vocab_size=50,
        transformer_width=128, transformer_heads=2, transformer_layers=2,
    ).eval()
    rng = np.random.RandomState(2)
    images = rng.randn(2, 3, 32, 32).astype(np.float32)
    text = rng.randint(0, 50, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        t_per_img, t_per_txt = model(
            torch.from_numpy(images), torch.from_numpy(text)
        )
    cfg, variables = build_clip_params(_np_sd(model))
    j_per_img, j_per_txt = CLIP(cfg).apply(
        variables, np.transpose(images, (0, 2, 3, 1)), text
    )
    np.testing.assert_allclose(
        np.asarray(j_per_img), t_per_img.numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(j_per_txt), t_per_txt.numpy(), atol=2e-3, rtol=1e-3
    )
