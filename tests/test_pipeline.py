"""End-to-end pipeline tests with injected features (no extractor weights)."""

import os

import numpy as np
import pytest

from video2music_tpu.core import constants as C
from video2music_tpu.pipeline import (Video2music, parse_primer,
                                      resolve_key_and_primer)
from video2music_tpu.pipeline.api import smooth_emotion


def test_parse_primer_translations():
    ids, roots, attrs = parse_primer("C Am F G")
    assert list(ids) == [1, 122, 66, 92]
    assert list(roots) == [1, 10, 6, 8]
    assert list(attrs) == [0, 5, 0, 0]  # generate-path: bare root attr 0


def test_parse_primer_accidentals_and_sevenths():
    ids, roots, attrs = parse_primer("Bb C#m7 FM7 Dm6")
    # Bb -> A#; C#m7 -> C#:min7; FM7 -> F:maj7; Dm6 -> D:min6
    from video2music_tpu.core.vocab import chord_dict
    d = chord_dict()
    assert ids[0] == d["A#"]
    assert ids[1] == d["C#:min7"]
    assert ids[2] == d["F:maj7"]
    assert ids[3] == d["D:min6"]


def test_resolve_key_flat_argmax_quirk():
    """The reference's emotion_idx is a FLAT argmax over (300, 6)
    (video2music.py:722) — key fallback is 'C major' unless the global max
    sits at flat index 1..3."""
    emo = np.zeros((300, 6), np.float32)
    emo[10, 3] = 0.99  # dominant sad, but flat index = 63
    key, kf, primer = resolve_key_and_primer(None, None, emo)
    assert key == "C major" and kf == 0.0 and primer == "C"
    emo2 = np.zeros((300, 6), np.float32)
    emo2[0, 1] = 0.99  # flat index 1 -> minor branch
    key2, kf2, primer2 = resolve_key_and_primer(None, None, emo2)
    assert key2 == "A minor" and kf2 == 1.0 and primer2 == "Am"


def test_explicit_key_and_primer_pass_through():
    emo = np.zeros((300, 6), np.float32)
    key, kf, primer = resolve_key_and_primer("E min", "Dm G", emo)
    assert key == "E min" and kf == 1.0 and primer == "Dm G"


def test_smooth_emotion_window5():
    x = np.zeros((10, 6), np.float32)
    x[5, 0] = 1.0
    out = smooth_emotion(x)
    np.testing.assert_allclose(out[3:8, 0], 0.2, rtol=1e-6)
    assert out[2, 0] == 0.0 and out[8, 0] == 0.0


@pytest.fixture(scope="module")
def tiny_pipeline():
    return Video2music(
        music_gen_version="2.2", reg_model="bigru", motion_type=0,
        amt_overrides=dict(n_layers=2, num_heads=2, d_model=16, d_ff=32),
        reg_overrides=dict(n_layers=1, d_model=8, d_hidden=16))


def test_generate_batch_matches_seeded_shapes(tiny_pipeline, tmp_path, rng):
    """generate_batch decodes B clips in one program: per-request primers
    of different lengths are honored, every clip gets its own output dir,
    and the primer tokens survive into the rendered chords."""
    def feats(n_sec, seed):
        r = np.random.default_rng(seed)
        return {
            "semantic": r.standard_normal((n_sec, 768)).astype(np.float32),
            "emotion": r.uniform(size=(n_sec, 6)).astype(np.float32),
            "scene_offset": np.arange(n_sec, dtype=np.float32),
            "motion": r.standard_normal((n_sec,)).astype(np.float32),
        }
    requests = [
        dict(features=feats(20, 0), primer="C Am", key="C major"),
        dict(features=feats(24, 1), primer="Dm G F", key="A minor"),
    ]
    results = tiny_pipeline.generate_batch(requests,
                                           output_dir=str(tmp_path))
    assert len(results) == 2
    assert len(results[0].chords) == 20 and len(results[1].chords) == 24
    assert results[0].chords[:2] == ["C", "A:min"]
    assert results[1].chords[:3] == ["D:min", "G", "F"]
    assert results[0].midi_path != results[1].midi_path
    for res in results:
        assert os.path.isfile(res.midi_path)


def test_generate_end_to_end(tiny_pipeline, tmp_path, rng):
    n_sec = 24
    feats = {
        "semantic": rng.standard_normal((n_sec, 768)).astype(np.float32),
        "emotion": rng.uniform(size=(n_sec, 6)).astype(np.float32),
        "scene_offset": np.arange(n_sec, dtype=np.float32),
        "motion": rng.standard_normal((n_sec,)).astype(np.float32),
    }
    res = tiny_pipeline.generate(primer="C Am", key="C major",
                                 features=feats,
                                 output_dir=str(tmp_path))
    assert len(res.chords) == n_sec
    assert res.chords[0] == "C" and res.chords[1] == "A:min"
    assert os.path.exists(res.midi_path)
    assert os.path.getsize(res.midi_path) > 20
    assert os.path.exists(tmp_path / "inst.csv")
    assert res.instruments.shape == (n_sec, C.INSTRUMENT_SIZE)
    assert all(0 <= d <= 4 for d in res.densities)
    assert all(0 < v <= 127 + 2 for v in res.velocities)
    assert res.key == "C major"


def test_generate_is_seeded(tiny_pipeline, tmp_path, rng):
    n_sec = 12
    feats = {
        "semantic": rng.standard_normal((n_sec, 768)).astype(np.float32),
        "emotion": rng.uniform(size=(n_sec, 6)).astype(np.float32),
        "scene_offset": np.arange(n_sec, dtype=np.float32),
        "motion": rng.standard_normal((n_sec,)).astype(np.float32),
    }
    r1 = tiny_pipeline.generate(primer="C", features=feats,
                                output_dir=str(tmp_path / "a"), seed=7)
    r2 = tiny_pipeline.generate(primer="C", features=feats,
                                output_dir=str(tmp_path / "b"), seed=7)
    assert r1.chords == r2.chords
    r3 = tiny_pipeline.generate(primer="C", features=feats,
                                output_dir=str(tmp_path / "c"), seed=8)
    assert r1.chords != r3.chords or True  # different seed may still match


def test_drawtext_filter_and_captions():
    """ffmpeg drawtext chain for the generate-CLI captions (host-side
    replacement for moviepy TextClip+ImageMagick, reference
    generate.py:68-72,694-709)."""
    from video2music_tpu.pipeline.video_io import (chord_caption_overlays,
                                                   drawtext_filter)

    ov = chord_caption_overlays(30, 120.0)
    assert ov == [("Prime Chords", 0.0, 30.0),
                  ("Generated Chords", 30.0, 120.0)]
    f = drawtext_filter(ov)
    assert f.count("drawtext=") == 2
    assert "between(t,0.0,30.0)" in f and "between(t,30.0,120.0)" in f
    assert "fontsize=24" in f and "fontcolor=white" in f
    # escaping: quotes/colons must not break the filter grammar
    f2 = drawtext_filter([("A:b'c", 0, 1)])
    assert "A\\:b\\'c" in f2


class _FakeTestDS:
    """Duck-typed test split for the demo server (ids + samples)."""

    def __init__(self, rng, n_sec=12):
        self._rng = rng
        self.n_sec = n_sec
        self.ids = ["demo1", "demo2"]

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx):
        rng = np.random.default_rng(idx)
        n = self.n_sec
        chord = np.full(300, C.CHORD_PAD, np.int64)
        chord[:n] = rng.integers(1, C.CHORD_END, n)
        return {
            "semantic": rng.standard_normal((n, 768)).astype(np.float32),
            "emotion": rng.uniform(size=(n, 6)).astype(np.float32),
            "scene_offset": np.arange(n, dtype=np.float32),
            "motion": rng.standard_normal((n,)).astype(np.float32),
            "chord": chord,
        }


def test_demo_server_end_to_end(tiny_pipeline, tmp_path, rng):
    """Drive the stdlib web demo (the gradio-surface replacement) over
    HTTP: form page lists test ids, POST /generate returns the chords and
    a MIDI link, /files serves it, traversal is rejected."""
    import threading
    import urllib.request
    import urllib.parse

    from video2music_tpu.cli.demo import DemoApp, make_server

    app = DemoApp(output_dir=str(tmp_path / "demo_out"),
                  v2m=tiny_pipeline, test_ds=_FakeTestDS(rng))
    srv = make_server(app)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "demo1" in page and "<form" in page

        data = urllib.parse.urlencode({
            "test_id": "demo1", "primer": "C Am", "key": "C major",
            "temperature": "1.0", "num_prime_chord": "2"}).encode()
        out = urllib.request.urlopen(base + "/generate", data=data).read()
        out = out.decode()
        assert "C major" in out
        assert "/files/run_001/output.mid" in out

        midi = urllib.request.urlopen(
            base + "/files/run_001/output.mid").read()
        assert midi[:4] == b"MThd"

        import pytest as _pytest
        with _pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(base + "/files/../../etc/passwd")
    finally:
        srv.shutdown()


def test_silu_approximation_fit():
    """The ported sigmoid_approximately experiment converges to a decent
    exponential SiLU fit on the reference's fitting range."""
    pytest.importorskip("scipy")
    from video2music_tpu.cli.silu_approx import (approx,
                                                 fit_silu_approximation,
                                                 silu)

    params = fit_silu_approximation()
    x = np.linspace(-5, 4, 200)
    err = np.max(np.abs(silu(x) - approx(params, x)))
    # the reference's own Powell fit from its init lands around ~0.8 max
    # error; assert convergence to that ballpark and a clear improvement
    # over predicting zero (max |silu| ~= 3.9 on the range)
    assert err < 1.0, err
    assert err < 0.3 * np.max(np.abs(silu(x)))


def test_pad_frame_bucket_shapes():
    import jax.numpy as jnp
    from video2music_tpu.pipeline.api import _pad_frame_bucket

    x = jnp.ones((61, 8, 8, 3))
    out = _pad_frame_bucket(x)
    assert out.shape[0] == 90
    np.testing.assert_array_equal(np.asarray(out[:61]), np.asarray(x))
    assert float(np.abs(np.asarray(out[61:])).sum()) == 0.0
    assert _pad_frame_bucket(jnp.ones((30, 4))).shape[0] == 30
    assert _pad_frame_bucket(jnp.ones((291, 4))).shape[0] == 300


def _write_clip(path, seconds=6, fps=5.0, w=64, h=48, n_scenes=3):
    """Small multi-scene clip via cv2 (no ffmpeg in this environment)."""
    cv2 = pytest.importorskip("cv2")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    if not writer.isOpened():
        pytest.skip("cv2.VideoWriter cannot encode here")
    n = int(seconds * fps)
    rng = np.random.default_rng(3)
    colors = rng.integers(0, 255, (n_scenes, 3))
    for i in range(n):
        scene = min(i * n_scenes // n, n_scenes - 1)
        img = np.empty((h, w, 3), np.uint8)
        img[:] = colors[scene]
        img[:, : (i * 7) % w] //= 2  # motion within the scene
        writer.write(img)
    writer.release()


def test_stream_clip_matches_legacy_pass(tmp_path):
    """The single-pass streaming reader must reproduce read_frames +
    second_boundary_pairs + content_scores EXACTLY — same 1fps frame
    selection, same boundary pairs, same scene scores (it replaced them
    on the product path for performance, not semantics)."""
    from video2music_tpu.features.scene import content_scores
    from video2music_tpu.pipeline import video_io

    path = os.path.join(str(tmp_path), "clip.mp4")
    _write_clip(path, seconds=6, fps=5.0)

    frames_1fps, frames_all, fps, duration = video_io.read_frames(path, 300)
    pairs_ref = video_io.second_boundary_pairs(frames_all, fps)
    scores_ref = content_scores(frames_all, bgr=True)

    s = video_io.stream_clip(path, 300)
    assert s["fps"] == fps and s["duration"] == duration
    assert s["n_frames_capped"] == len(frames_all)
    np.testing.assert_array_equal(s["frames_1fps"], frames_1fps)
    assert len(s["pairs"]) == len(pairs_ref)
    for (p1, c1), (p2, c2) in zip(s["pairs"], pairs_ref):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(s["scores"], scores_ref)


@pytest.fixture(scope="module")
def tiny_extracting_v2m():
    """A Video2music with TINY real extractors (56px CLIP with the
    product's 768-d projection, 56px 2-stage MaxViT) so the full
    extraction path runs on the CPU backend in seconds."""
    import jax
    import jax.numpy as jnp

    from video2music_tpu.features.clip import (CLIP, CLIPConfig,
                                               CLIPVisionConfig)
    from video2music_tpu.features.maxvit import MaxViT, MaxViTConfig

    ccfg = CLIPConfig(vision=CLIPVisionConfig(
        hidden_size=16, layers=1, heads=2, patch_size=14, image_size=56,
        projection_dim=768))
    mcfg = MaxViTConfig(channels=(8, 16), depths=(1, 1), stem_channels=8,
                        partition=7, head_dim=8, image_size=56)
    rng = jax.random.PRNGKey(0)
    text = np.asarray(jax.random.normal(jax.random.fold_in(rng, 1),
                                        (6, 768)), np.float32)
    clip_model = CLIP(cfg=ccfg)
    clip_params = clip_model.init(
        rng, jnp.zeros((1, 56, 56, 3)), jnp.asarray(text),
        method=CLIP.semantic_and_emotion)["params"]
    mv = MaxViT(cfg=mcfg)
    mv_params = mv.init(jax.random.fold_in(rng, 2),
                        jnp.zeros((1, 56, 56, 3)))["params"]
    return Video2music(
        music_gen_version="2.2", reg_model="bigru", motion_type=1,
        amt_overrides=dict(n_layers=1, num_heads=2, d_model=16, d_ff=32),
        reg_overrides=dict(n_layers=1, d_model=8, d_hidden=16),
        clip_params=clip_params, emotion_text_embeds=text,
        maxvit_params=mv_params, clip_cfg=ccfg, maxvit_cfg=mcfg,
        extractor_dtype="float32")


def test_chunked_extraction_matches_monolithic(tiny_extracting_v2m,
                                               tmp_path):
    """extract_features dispatches 30-frame chunks inside the decode loop;
    the result must equal one monolithic dispatch over the whole clip
    (frames are independent batch rows)."""
    import jax.numpy as jnp

    from video2music_tpu.features import scene as scene_mod
    from video2music_tpu.features.clip import resize_crop_frames
    from video2music_tpu.features.maxvit import (motion_diff_frames,
                                                 resize_crop_diff_frames)
    from video2music_tpu.pipeline import video_io
    from video2music_tpu.pipeline.api import _pad_frame_bucket

    v2m = tiny_extracting_v2m
    path = os.path.join(str(tmp_path), "clip.mp4")
    _write_clip(path, seconds=70, fps=5.0)  # 3 chunks: 30 + 30 + 10

    got = v2m.extract_features(path)

    # oracle: the legacy shape — one dispatch over everything
    stream = video_io.stream_clip(path, 300)
    jits = v2m._feature_jits
    pixels = _pad_frame_bucket(jnp.asarray(resize_crop_frames(
        stream["frames_1fps"], 56, backend="cv2")))
    sem, emo = jits["clip"]({"params": v2m.clip_params}, pixels,
                            jnp.asarray(v2m.emotion_text_embeds))
    n_sec = stream["frames_1fps"].shape[0]
    diffs = motion_diff_frames(stream["pairs"])
    mot = jits["motion"]({"params": v2m.maxvit_params}, _pad_frame_bucket(
        jnp.asarray(resize_crop_diff_frames(diffs, 56, backend="cv2"))))
    cuts = scene_mod.detect_cuts(scores=stream["scores"])
    spans = scene_mod.scenes_from_cuts(cuts, stream["n_frames_capped"],
                                       stream["fps"])
    ids = scene_mod.scene_ids_per_second(spans, n_sec)
    scene_offset = np.asarray(scene_mod.scene_offsets(ids),
                              np.float32) + 1.0

    assert got["semantic"].shape == (70, 768)
    assert got["emotion"].shape == (70, 6)
    assert got["motion"].shape[0] == len(stream["pairs"]) + 1
    np.testing.assert_allclose(got["semantic"], np.asarray(sem)[:n_sec],
                               atol=1e-5)
    np.testing.assert_allclose(got["emotion"], np.asarray(emo)[:n_sec],
                               atol=1e-5)
    np.testing.assert_allclose(got["motion"],
                               np.asarray(mot)[:len(diffs)], atol=1e-5)
    np.testing.assert_array_equal(got["scene_offset"], scene_offset)


def test_extract_features_batch_matches_per_clip(tiny_extracting_v2m,
                                                 tmp_path):
    """Cross-clip coalesced extraction slices back to exactly the
    per-clip results (incl. the per-clip leading zero motion row)."""
    v2m = tiny_extracting_v2m
    paths = []
    for i, sec in enumerate((6, 9)):
        p = os.path.join(str(tmp_path), f"clip{i}.mp4")
        _write_clip(p, seconds=sec, fps=5.0, n_scenes=2 + i)
        paths.append(p)

    batch = v2m.extract_features_batch(paths)
    singles = [v2m.extract_features(p) for p in paths]
    assert len(batch) == 2
    for got, want in zip(batch, singles):
        for k in ("semantic", "emotion", "motion"):
            np.testing.assert_allclose(got[k], want[k], atol=1e-5,
                                       err_msg=k)
        np.testing.assert_array_equal(got["scene_offset"],
                                      want["scene_offset"])


def test_stream_clip_respects_max_seconds(tmp_path):
    from video2music_tpu.pipeline import video_io

    path = os.path.join(str(tmp_path), "clip.mp4")
    _write_clip(path, seconds=8, fps=5.0)
    frames_1fps, frames_all, fps, _ = video_io.read_frames(path, 4)
    s = video_io.stream_clip(path, 4)
    assert s["n_frames_capped"] == len(frames_all) == 20
    assert s["n_frames"] == 40  # duration still counts the whole clip
    np.testing.assert_array_equal(s["frames_1fps"], frames_1fps)
    assert len(s["scores"]) == 20
