"""MaxViT / scene detection / audio feature tests."""

import io

import jax
import numpy as np
import pytest

from video2music_tpu.features.maxvit import (MaxViT, MaxViTConfig,
                                             motion_diff_frames,
                                             preprocess_diff_frames,
                                             scalar_motion)
from video2music_tpu.features.scene import (content_scores, detect_cuts,
                                            scene_ids_per_second,
                                            scene_offsets, scenes_from_cuts)
from video2music_tpu.features.audio import (loudness_per_second,
                                            note_density_per_second)
from video2music_tpu.midi.writer import MIDIFile
from video2music_tpu.midi.reader import read_midi


def test_maxvit_tiny_forward(rng):
    cfg = MaxViTConfig(channels=(8, 16), depths=(1, 1), stem_channels=8,
                       partition=2, head_dim=4, image_size=16)
    model = MaxViT(cfg=cfg)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats.shape == (2, 16)
    assert np.isfinite(np.asarray(feats)).all()


def test_maxvit_t_output_is_512(rng):
    # full config, shape check only via lazy shape inference (init is heavy)
    cfg = MaxViTConfig()
    assert cfg.channels[-1] == 512


def test_maxvit_converter_parity_vs_torch_mirror(rng):
    """Round-trip a random-weight torch MaxViT (exact torchvision 0.18.1
    graph reconstruction, tools/torch_maxvit_mirror.py) through
    convert_torchvision_maxvit and require numerical agreement with the
    flax model — validating layer names, conv transposes, the qkv packing,
    BN folding (eps=1e-3), torch-aligned stride-2 padding, the grid
    partition axis swap, and the feat_dim**-0.5 attention scale
    (reference usage: video2music.py:298-341)."""
    torch = pytest.importorskip("torch")
    from tools.torch_maxvit_mirror import MaxVit as TorchMaxVit
    from tools.torch_maxvit_mirror import feature_extractor
    from video2music_tpu.features.maxvit import convert_torchvision_maxvit

    torch.manual_seed(0)
    # tiny instantiation covering every structural case: stride-2 MBConv
    # with channel change (both stages), stride-1 identity-proj MBConv
    # (stage0 depth 2), window + grid attention at g>1 and g==1
    mirror = TorchMaxVit(input_size=(16, 16), stem_channels=8,
                         partition_size=2, block_channels=(8, 16),
                         block_layers=(2, 1), head_dim=4)
    mirror = feature_extractor(mirror).eval()
    with torch.no_grad():
        for p in mirror.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
        for name, b in mirror.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn_like(b) * 0.2)
            elif name.endswith("running_var"):
                b.copy_(torch.rand_like(b) + 0.5)

    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    cfg = MaxViTConfig(channels=(8, 16), depths=(2, 1), stem_channels=8,
                       partition=2, head_dim=4, image_size=16)
    params = convert_torchvision_maxvit(mirror.state_dict(), cfg)
    got = MaxViT(cfg=cfg).apply({"params": jax.tree_util.tree_map(
        np.asarray, params)}, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_motion_diff_and_scalar(rng):
    frames = [rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
              for _ in range(8)]
    # consecutive-frame pairs at second boundaries (video_io helper)
    from video2music_tpu.pipeline.video_io import second_boundary_pairs
    pairs = second_boundary_pairs(frames, fps=2.0)  # boundaries at idx 2,4,6
    assert len(pairs) == 3
    # each pair is (frame[i-1], frame[i]) — consecutive, NOT 1 s apart
    assert pairs[0][1] is frames[2] and pairs[0][0] is frames[1]
    diffs = motion_diff_frames(pairs)
    assert diffs.shape == (4, 24, 32, 3)
    assert (diffs[0] == 0).all()  # leading zero frame
    vals = scalar_motion(pairs)
    assert vals.shape == (4,)
    assert vals[0] == 0.0 and (vals[1:] > 0).all()
    pre = preprocess_diff_frames(diffs, image_size=16)
    assert pre.shape == (4, 16, 16, 3)


def _synthetic_video(n=60, h=24, w=32, cut_at=30, seed=0):
    rng = np.random.default_rng(seed)
    base1 = rng.integers(0, 80, (h, w, 3), dtype=np.uint8)
    base2 = rng.integers(170, 250, (h, w, 3), dtype=np.uint8)
    frames = []
    for i in range(n):
        base = base1 if i < cut_at else base2
        noise = rng.integers(0, 5, (h, w, 3), dtype=np.uint8)
        frames.append(np.clip(base.astype(int) + noise, 0, 255).astype(
            np.uint8))
    return np.stack(frames)


def test_scene_detection_finds_hard_cut():
    frames = _synthetic_video()
    scores = content_scores(frames)
    assert scores[0] == 0.0
    assert scores[30] > 10 * np.median(scores[1:29])
    cuts = detect_cuts(frames)
    assert cuts == [30]


def test_scene_detection_no_cut_on_static():
    frames = _synthetic_video(cut_at=10**9)  # never switches
    assert detect_cuts(frames) == []


def test_scene_ids_and_offsets():
    scene_list = [(0.0, 3.2), (3.2, 7.0)]
    ids = scene_ids_per_second(scene_list, 7)
    assert ids == [0, 0, 0, 0, 1, 1, 1]
    offs = scene_offsets(ids)
    assert offs == [0, 1, 2, 3, 0, 1, 2]
    assert scene_ids_per_second([], 3) == [0, 0, 0]


def test_scenes_from_cuts():
    spans = scenes_from_cuts([30], 60, fps=10.0)
    assert spans == [(0.0, 3.0), (3.0, 6.0)]


def test_loudness_per_second():
    rate = 1000
    quiet = (np.sin(np.linspace(0, 440, rate)) * 300).astype(np.int16)
    loud = (np.sin(np.linspace(0, 440, rate)) * 30000).astype(np.int16)
    vals = loudness_per_second(np.concatenate([quiet, loud]), rate)
    assert len(vals) == 2
    assert float(vals[1]) > float(vals[0])
    assert 0.0 <= float(vals[0]) <= 1.0


def test_note_density_roundtrip(tmp_path):
    m = MIDIFile(1)
    m.addTempo(0, 0, 60)  # 1 beat = 1 second
    for beat in range(4):
        m.addNote(0, 0, 60 + beat, beat, 0.9, 90)
    m.addNote(0, 0, 72, 0.0, 3.5, 90)  # long note overlaps all windows
    p = tmp_path / "t.mid"
    with open(p, "wb") as f:
        m.writeFile(f)
    md = read_midi(str(p))
    assert len(md.notes) == 5
    np.testing.assert_allclose(md.notes[0].start, 0.0, atol=1e-3)
    dens = note_density_per_second(str(p))
    assert dens[0] == 2.0  # short note + long note
    assert dens[1] == 2.0
    assert dens[3] == 2.0  # note at beat 3 + tail of long note


def test_midi_reader_tempo_change(tmp_path):
    m = MIDIFile(1)
    m.addTempo(0, 0, 120)   # 0.5 s/beat
    m.addTempo(0, 2, 60)    # from beat 2: 1 s/beat
    m.addNote(0, 0, 60, 3.0, 1.0, 90)  # starts at 2*0.5 + 1*1.0 = 2.0 s
    p = tmp_path / "t2.mid"
    with open(p, "wb") as f:
        m.writeFile(f)
    md = read_midi(str(p))
    np.testing.assert_allclose(md.notes[0].start, 2.0, atol=1e-3)


# ---------------------------------------------------------------------------
# Scene detection: independent stateful transcription of scenedetect 0.6.1's
# AdaptiveDetector loop (golden oracle; reference usage video2music.py:211-237)
# ---------------------------------------------------------------------------

def _oracle_adaptive_detector(scores, adaptive_threshold=3.0,
                              min_scene_len=15, window_width=2,
                              min_content_val=15.0):
    """Per-frame buffer loop exactly as scenedetect 0.6.1 processes frames:
    buffer 2w+1 scores, decide for the middle frame, ratio capped at 255,
    zero-average fallback, first cut exempt from min_scene_len."""
    buf = []
    required = 1 + 2 * window_width
    last_cut = None
    cuts = []
    for frame_num, score in enumerate(scores):
        buf.append((frame_num, float(score)))
        if len(buf) < required:
            continue
        buf = buf[-required:]
        target_frame, target_score = buf[window_width]
        avg = sum(s for i, (_, s) in enumerate(buf)
                  if i != window_width) / (2.0 * window_width)
        if abs(avg) < 0.00001:
            ratio = 255.0 if target_score >= min_content_val else 0.0
        else:
            ratio = min(target_score / avg, 255.0)
        if ratio >= adaptive_threshold and target_score >= min_content_val:
            if last_cut is None or target_frame - last_cut >= min_scene_len:
                cuts.append(target_frame)
                last_cut = target_frame
    return cuts


def _clip_hard_cuts(rng, T=90, cuts_at=(30, 60)):
    """Static color blocks with hard cuts (no noise: HSV hue of noisy
    near-constant colors is unstable and would swamp the adaptive ratio —
    static blocks exercise the zero-average -> ratio-255 fallback exactly
    like a tripod shot)."""
    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200)]
    frames = np.zeros((T, 24, 32, 3), np.uint8)
    seg = 0
    for t in range(T):
        if seg < len(cuts_at) and t >= cuts_at[seg]:
            seg += 1
        frames[t] = np.array(colors[seg % len(colors)], np.uint8)
    return frames


def _clip_fade(rng, T=60):
    """Slow luminance fade — high total change but spread over frames, so
    the adaptive ratio must NOT fire."""
    frames = np.zeros((T, 24, 32, 3), np.uint8)
    for t in range(T):
        v = int(40 + 170 * t / (T - 1))
        frames[t] = v
    return frames


def _clip_flash(rng, T=60, flash_at=25):
    """Single white flash frame: two large deltas close together — 0.6.1
    fires on the flash onset (the return frame is inside min_scene_len)."""
    frames = _clip_hard_cuts(rng, T, cuts_at=())
    frames[flash_at] = 255
    return frames


def test_scene_detector_matches_0_6_1_oracle(rng):
    for clip in (_clip_hard_cuts(rng), _clip_fade(rng), _clip_flash(rng),
                 rng.integers(0, 255, (50, 24, 32, 3)).astype(np.uint8)):
        scores = content_scores(clip, downscale=False)
        want = _oracle_adaptive_detector(scores)
        got = detect_cuts(clip)
        assert got == want, (got, want)


def test_scene_detector_hard_cuts_found(rng):
    clip = _clip_hard_cuts(rng, T=90, cuts_at=(30, 60))
    assert detect_cuts(clip) == [30, 60]


def test_scene_detector_fade_no_cut(rng):
    assert detect_cuts(_clip_fade(rng)) == []


def test_scene_detector_min_scene_len(rng):
    # cuts 10 frames apart: only the first fires (min_scene_len=15), both
    # fire when the minimum is lowered
    clip = _clip_hard_cuts(rng, T=60, cuts_at=(20, 30))
    assert detect_cuts(clip) == [20]
    assert detect_cuts(clip, min_scene_len=5) == [20, 30]


def test_scene_detector_edge_frames_never_cut(rng):
    # a hard cut inside the first window_width frames is invisible to the
    # 0.6.1 buffer logic (decision starts at the first full window)
    clip = _clip_hard_cuts(rng, T=30, cuts_at=(1,))
    assert detect_cuts(clip) == []


def test_content_scorer_native_cv2_numpy_parity(rng):
    """The native fused kernel must be BIT-IDENTICAL to the cv2 chain on
    uint8 input (it replicates OpenCV's RGB2HSV_b fixed-point math —
    cvRound tables, hsv_shift=12 — exactly), so cuts can never depend on
    which of the two ran (native/v2m_native.cpp:v2m_hsv_score). The numpy
    float fallback is only approximately equal (float HSV vs integer HSV),
    as it always was vs cv2."""
    from video2music_tpu.features.scene import ContentScorer
    from video2music_tpu.data import native
    if not native.available():
        pytest.skip("native library unavailable")
    # odd width exercises the AVX2 scalar tail; downscale=True exercises
    # the strided-view path (factor 2 on a 520-wide frame)
    frames = [rng.integers(0, 256, (36, 520, 3), np.uint8)
              for _ in range(12)]
    for bgr in (False, True):
        runs = []
        for backend in ("native", "cv2", "numpy"):
            s = ContentScorer(bgr=bgr)
            if backend != "native":
                s._native = None
            if backend == "numpy":
                s._cv2 = None
            for f in frames:
                s.update(f)
            if backend == "native":
                assert s._native is not None, "native path fell back"
            runs.append(s.scores())
        np.testing.assert_array_equal(runs[0], runs[1])
        np.testing.assert_allclose(runs[0], runs[2], rtol=0.02, atol=0.5)


def test_content_scorer_native_hsv_matches_cv2_bit_exact(rng):
    """Raw kernel check: HSV planes and the absdiff mean against cv2 on
    random shapes, strided and flipped (negative-stride) views."""
    cv2 = pytest.importorskip("cv2")
    from video2music_tpu.data import native
    if not native.available():
        pytest.skip("native library unavailable")
    for trial in range(12):
        h, w = rng.integers(2, 90, 2)
        frame = rng.integers(0, 256, (h, w, 3), np.uint8)
        if trial % 3 == 1:
            big = rng.integers(0, 256, (h * 2, w * 3, 3), np.uint8)
            frame = big[::2, ::3]
        if trial % 3 == 2:
            frame = frame[::-1]  # negative row stride -> scalar path
        for bgr in (False, True):
            code = cv2.COLOR_BGR2HSV if bgr else cv2.COLOR_RGB2HSV
            ref = cv2.cvtColor(np.ascontiguousarray(frame), code)
            cur = np.empty((frame.shape[0], frame.shape[1], 3), np.uint8)
            assert native.hsv_score(frame, None, cur, bgr) == 0.0
            np.testing.assert_array_equal(cur, ref)
            prev = rng.integers(0, 256, cur.shape, np.uint8)
            got = native.hsv_score(frame, prev, cur, bgr)
            assert got == float(np.mean(cv2.absdiff(ref, prev)))


def test_uint8_preprocess_matches_float_path(rng):
    """Host resize/crop (uint8) + in-graph normalize == the one-shot float
    preprocess — the H2D-lean serving path must be numerically identical."""
    import jax.numpy as jnp
    from video2music_tpu.features.clip import (normalize_pixels,
                                               preprocess_frames,
                                               resize_crop_frames)
    from video2music_tpu.features.maxvit import (normalize_diff_pixels,
                                                 preprocess_diff_frames,
                                                 resize_crop_diff_frames)

    frames = rng.integers(0, 256, (3, 50, 70, 3)).astype(np.uint8)
    want = preprocess_frames(frames, image_size=32)
    got = np.asarray(normalize_pixels(
        jnp.asarray(resize_crop_frames(frames, image_size=32))))
    np.testing.assert_allclose(got, want, atol=1e-6)

    want_m = preprocess_diff_frames(frames, image_size=32)
    got_m = np.asarray(normalize_diff_pixels(
        jnp.asarray(resize_crop_diff_frames(frames, image_size=32))))
    np.testing.assert_allclose(got_m, want_m, atol=1e-6)
