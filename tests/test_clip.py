"""CLIP architecture + converter parity vs HuggingFace CLIPModel with random
weights (offline — validates the exact math without downloading checkpoints).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from video2music_tpu.features.clip import (CLIP, CLIPConfig, CLIPTextConfig,
                                           CLIPVisionConfig, convert_hf_clip,
                                           preprocess_frames)


@pytest.fixture(scope="module")
def small_pair():
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel as HFCLIPModel

    hf_cfg = HFCLIPConfig(
        text_config={
            "hidden_size": 32, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "vocab_size": 99, "max_position_embeddings": 16,
            "hidden_act": "quick_gelu",
            # HF pools at the first eos_token_id; OpenAI (and our tower)
            # pool at argmax(ids). With EOT = highest vocab id at the end
            # of every sequence, the two conventions coincide — true for
            # the real OpenAI vocabulary (EOT = 49407).
            "eos_token_id": 98,
        },
        vision_config={
            "hidden_size": 48, "intermediate_size": 192,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 32, "patch_size": 8, "hidden_act": "quick_gelu",
        },
        projection_dim=24,
    )
    torch.manual_seed(0)
    hf = HFCLIPModel(hf_cfg).eval()

    cfg = CLIPConfig(
        vision=CLIPVisionConfig(hidden_size=48, layers=2, heads=2,
                                patch_size=8, image_size=32,
                                projection_dim=24),
        text=CLIPTextConfig(hidden_size=32, layers=2, heads=2, vocab_size=99,
                            context_length=16, projection_dim=24))
    model = CLIP(cfg=cfg)
    params = convert_hf_clip(hf.state_dict(), cfg)
    return hf, model, {"params": params}


def test_image_tower_parity(small_pair):
    hf, model, variables = small_pair
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf.get_image_features(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(pixels),
                                 method=model.encode_image))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_text_tower_parity(small_pair):
    hf, model, variables = small_pair
    rng = np.random.default_rng(1)
    # EOT convention: pooled at argmax(token_ids) — make the last real token
    # the largest id, as OpenAI/HF vocabularies do with their EOT id
    ids = rng.integers(1, 90, (4, 16))
    ids[:, -1] = 98
    with torch.no_grad():
        want = hf.get_text_features(torch.from_numpy(ids)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(ids),
                                 method=model.encode_text))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_zero_shot_logits_parity(small_pair):
    hf, model, variables = small_pair
    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(1, 90, (6, 16))
    ids[:, -1] = 98
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
                 input_ids=torch.from_numpy(ids),
                 attention_mask=torch.ones_like(torch.from_numpy(ids)))
        want = out.logits_per_image.softmax(dim=-1).numpy()
    li, _ = model.apply(variables, jnp.asarray(pixels), jnp.asarray(ids))
    got = np.asarray(jax.nn.softmax(li, axis=-1))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_emotion_probs_shape(small_pair):
    _, model, variables = small_pair
    rng = np.random.default_rng(3)
    pixels = rng.standard_normal((5, 32, 32, 3)).astype(np.float32)
    text_emb = rng.standard_normal((6, 24)).astype(np.float32)
    probs = model.apply(variables, jnp.asarray(pixels),
                        jnp.asarray(text_emb), method=model.emotion_probs)
    probs = np.asarray(probs)
    assert probs.shape == (5, 6)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_preprocess_frames():
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 255, (2, 50, 70, 3), dtype=np.uint8)
    out = preprocess_frames(frames, image_size=32)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()
    # normalization: a mid-gray image maps near zero
    gray = np.full((1, 40, 40, 3), 120, np.uint8)
    og = preprocess_frames(gray, image_size=32)
    assert np.abs(og).max() < 1.0
