"""Raw-video end-to-end pipeline test: synthetic mp4 -> frames -> ViT feats
-> transient data root -> grounded QA predictions (BASELINE config #5)."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_raw_video_pipeline(tmp_path, repo_root):
    cv2 = pytest.importorskip("cv2")
    sys.path.insert(0, repo_root)
    from tools import e2e_pipeline as P
    from vitxtgqa_tpu.core.registry import registry

    # 1. synthesize a tiny video with text-like blocks
    vdir = tmp_path / "videos"
    os.makedirs(vdir)
    w, h = 128, 96
    writer = cv2.VideoWriter(
        str(vdir / "clip01.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h)
    )
    rng = np.random.default_rng(0)
    for _ in range(12):
        frame = rng.integers(0, 255, (h, w, 3), np.uint8)
        writer.write(frame)
    writer.release()

    # 2. synthetic OCR detections per frame
    ocr_dir = tmp_path / "ocr"
    os.makedirs(ocr_dir)
    info = {
        str(f): [
            {"points": [10, 10, 60, 10, 60, 30, 10, 30], "ocr": "stop", "ID": 1}
        ]
        for f in range(1, 13)
    }
    np.save(ocr_dir / "clip01.npy", np.array(info, dtype=object), allow_pickle=True)

    questions = [
        {"question_id": 1, "video_id": "clip01",
         "question": "what does the sign say?", "answers": ["stop"]}
    ]
    qpath = tmp_path / "questions.json"
    qpath.write_text(json.dumps(questions))

    workdir = str(tmp_path / "work")
    os.makedirs(workdir)

    # run all stages with a tiny ViT to keep the CPU compile fast
    import vitxtgqa_tpu.models.vit as vit_mod

    small = vit_mod.ViTConfig(
        image_size=32, patch_size=16, hidden_size=64, num_layers=1,
        num_heads=4, mlp_dim=128,
    )
    orig = vit_mod.VIT_L_16
    vit_mod.VIT_L_16 = small
    try:
        meta = P.decode_videos(str(vdir), os.path.join(workdir, "frames"), fps=10)
        P.extract_features(
            os.path.join(workdir, "frames"), os.path.join(workdir, "vit_feats")
        )
        P.assemble_data_root(
            workdir, str(qpath), str(ocr_dir),
            os.path.join(workdir, "vit_feats"), meta,
            vocab_path=os.path.join(
                os.path.dirname(__file__), "fixtures", "vocab_small.txt"
            ),
        )
        registry.clear_state()
        report = P.run_inference(
            workdir, os.path.join(repo_root, "configs", "m4c_abinet.yml"),
            "m4c", batch_size=1,
            extra_opts=[
                "training_parameters.tpu.compute_dtype=float32",
                "model_attributes.m4c.text_bert.num_hidden_layers=1",
                "model_attributes.m4c.mmt.num_hidden_layers=1",
            ],
        )
    finally:
        vit_mod.VIT_L_16 = orig

    assert meta["clip01"][0] == 12
    # feature files exist with the tiny ViT's dim
    feat = np.load(os.path.join(workdir, "vit_feats", "clip01", "1.npy"))
    assert feat.shape == (1, 64)
    preds = json.load(open(report))
    assert len(preds) == 1
    assert preds[0]["video_id"] == "clip01"
    assert "grounded box" in preds[0] and "answer" in preds[0]
