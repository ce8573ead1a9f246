"""The product API: ``Video2music().generate(video, primer, key, ...)``.

Rebuild of the reference's end-to-end pipeline (reference:
``video2music.py:587-1053``) on the TPU-native stack:

  * feature extraction is BATCHED — all frames go through CLIP / MaxViT in
    one jitted forward each (the reference runs one frame per forward,
    video2music.py:160-165,189-194,324-326);
  * chord decoding is the KV-cached in-graph sampler (decode/sampler.py)
    instead of ~300 full-prefix re-forwards;
  * MIDI assembly / FluidSynth / ffmpeg muxing stay host-side, as upstream.

Reproduced live-path quirks (documented, flag-switchable where sensible):
  * the emotion index used for key/primer fallback is a FLAT argmax over the
    (300, 6) emotion matrix (``torch.argmax`` with no dim,
    video2music.py:722), so the fallback key is almost always "C major";
  * ``addControllerEvent(0, 0, 0, panning_val, 0)`` passes the pan value as
    the controller NUMBER with value 0 (video2music.py:966) — i.e. panning
    never actually pans; ``correct_panning=True`` emits a proper CC10;
  * the in-renderer transposition is computed then zeroed
    (midi/arpeggio.py docstring).

Documented deviation: the rendered chord sequence is truncated to the
video's real duration (``n_sec``) — the reference always renders all 300
generated chords, so its output.mid runs 300 s regardless of video length
(video2music.py:935-992); the muxed mp4 is then cut by moviepy. Rendering
only n_sec chords yields identical muxed output with a sane standalone
.mid/.flac.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core.config import RegressionConfig, amt_config
from ..core.vocab import chord_inv_dict
from ..data import native as _native
from ..decode.sampler import GenerateConfig, generate_chords
from ..midi import MIDIFile, Chord, voice, add_chord, chord_offsets
from ..midi.arpeggio import density_bucket, velocity_from_loudness
from ..models import VideoMusicTransformer, VideoRegression
from . import video_io
from .primer import TRANSPOSE_KEY, parse_primer, resolve_key_and_primer

ARPEGGIO_INSTRUMENTS = frozenset(
    (3, 7, 8, 11, 14, 27, 31, 37, 38, 39))
LEFT_PAN = frozenset((13, 14, 16, 25, 28, 29, 34, 39))
CENTER_PAN = frozenset((7, 15, 17, 20, 21, 23, 24, 30, 32, 33, 35, 36, 37,
                        38))
PAN_VALS = {"left": 32, "center": 64, "right": 96}
LOW_VELOCITY_INSTRUMENTS = frozenset((14,))
BASE_TEMPO = 120
CHORD_DURATION_BEATS = 2  # 1 second per chord at 120 bpm
INSTRUMENT_THRESHOLD = 0.35
MAX_SECONDS = 300


def _inst_policy(n_inst: int = C.INSTRUMENT_SIZE):
    """The per-instrument render policy (pan/arpeggio/velocity sets above)
    as flat rows for the native renderer (data/native.render_clip)."""
    pan = np.asarray([
        PAN_VALS["left"] if i in LEFT_PAN else
        PAN_VALS["center"] if i in CENTER_PAN else PAN_VALS["right"]
        for i in range(n_inst)], np.int32)
    return dict(
        arp=np.asarray([i in ARPEGGIO_INSTRUMENTS
                        for i in range(n_inst)], np.uint8),
        vel=np.asarray([1.15 if i in LOW_VELOCITY_INSTRUMENTS else 1.0
                        for i in range(n_inst)], np.float64),
        pan_ctrl_correct=np.full(n_inst, 10, np.int32),
        pan_param_correct=pan,
        # reference quirk: pan value lands in the controller-number byte
        pan_ctrl_quirk=pan,
        pan_param_quirk=np.zeros(n_inst, np.int32),
    )


_INST_POLICY = _inst_policy()


@dataclasses.dataclass
class GenerateResult:
    chords: List[str]
    chord_ids: np.ndarray
    midi_path: Optional[str]
    audio_path: Optional[str]
    video_path: Optional[str]
    densities: List[int]
    velocities: List[int]
    instruments: np.ndarray
    key: str


def smooth_emotion(emotion: np.ndarray, window: int = 5) -> np.ndarray:
    """Grouped 1-d average over time, zero padded (reference:
    video2music.py:827-831). emotion: (L, 6)."""
    k = np.ones(window, np.float32) / window
    pad = window // 2
    padded = np.pad(emotion, ((pad, pad), (0, 0)))
    out = np.empty_like(emotion)
    for c in range(emotion.shape[1]):
        out[:, c] = np.convolve(padded[:, c], k, mode="valid")
    return out


def _pad_frame_bucket(frames, bucket: int = 30):
    """Zero-pad a frame batch up to the next ``bucket`` multiple (capped at
    MAX_SECONDS) so extractor programs compile per bucket, not per clip
    duration. Callers slice the output back to the true length — frames
    are independent batch elements, so padding is exact."""
    n = frames.shape[0]
    target = min(MAX_SECONDS, -(-max(n, 1) // bucket) * bucket)
    if target == n:
        return frames
    pad = [(0, target - n)] + [(0, 0)] * (frames.ndim - 1)
    return jnp.pad(frames, pad)


def _pad_to(arr: np.ndarray, length: int) -> np.ndarray:
    if arr.shape[0] >= length:
        return arr[:length]
    pad_shape = (length - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.zeros(pad_shape, arr.dtype)], axis=0)


def _gc_quiet(fn):
    """Run the whole extraction (decode, resize loops, device fetches)
    under ``video_io.gc_quiet``: with jax/flax's ~270k tracked objects
    live, every ~1k host allocations trigger cyclic-GC passes costing
    whole seconds (measured: a 60-frame cv2.resize loop is 2.1 s GC-on vs
    0.21 s inside the guard). ``ClipStream`` guards its own decode loop;
    this extends the guard over the tail flush + fetches (reentrant)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with video_io.gc_quiet():
            return fn(*args, **kwargs)
    return wrapper


class Video2music:
    """TPU-native Video2music.

    Weights come from orbax checkpoints (``amt_checkpoint``/
    ``reg_checkpoint``) or random initialization (smoke/testing). Feature
    extractor params (CLIP / MaxViT) are optional: without them,
    ``generate`` must be given precomputed ``features``.
    """

    def __init__(self, *, music_gen_version: str = "2.2",
                 reg_model: str = "bimamba+", motion_type: int = 1,
                 amt_checkpoint: Optional[str] = None,
                 reg_checkpoint: Optional[str] = None,
                 clip_params=None, emotion_text_embeds=None,
                 maxvit_params=None, seed: int = 0,
                 amt_overrides: Optional[dict] = None,
                 reg_overrides: Optional[dict] = None,
                 extractor_dtype: str = "bfloat16",
                 resize_backend: str = "cv2",
                 clip_cfg=None, maxvit_cfg=None):
        self.motion_type = motion_type
        # extractor architecture overrides (tests use tiny configs; the
        # product default is the reference pair: CLIP ViT-L/14@336 +
        # MaxViT-T, video2music.py:151,298)
        self._clip_cfg = clip_cfg
        self._maxvit_cfg = maxvit_cfg
        self.extractor_dtype = extractor_dtype
        # "cv2" = SIMD resize (serving default, ~10x faster per frame on
        # 1-core hosts); "pil" = bit-exact reference preprocessing
        self.resize_backend = resize_backend
        motion_dim = {0: 1, 1: 512, 2: 768}[motion_type]
        total_vf = 768 + 1 + motion_dim + 6  # reference: video2music.py:609
        self.amt_cfg = amt_config(music_gen_version, total_vf_dim=total_vf,
                                  **(amt_overrides or {}))
        self.model = VideoMusicTransformer(cfg=self.amt_cfg)
        self.reg_cfg = RegressionConfig(reg_model=reg_model,
                                        total_vf_dim=768 + 6,
                                        **(reg_overrides or {}))
        self.model_reg = VideoRegression(cfg=self.reg_cfg)
        # Pin extractor weights to the accelerator ONCE, with an EXPLICIT
        # device: CPU-committed params (e.g. checkpoints loaded/converted
        # on host) would otherwise pin the jitted extractors to the CPU
        # backend — jax.device_put without a device target does NOT move a
        # committed array, and jit follows committed inputs (measured: the
        # whole CLIP forward silently ran on CPU at ~16 GFLOP/s,
        # ~950 s/clip, instead of on the TPU).
        # Extractor weights are cast to ``extractor_dtype`` here (default
        # bf16: full-rate MXU matmuls, half the resident weight HBM; pass
        # "float32" for bit-parity with the torch reference). The pixel
        # path casts to match in-graph — f32 inputs would silently promote
        # bf16 kernels back to f32 (see CLAUDE.md).
        dev = jax.devices()[0]
        ex_dt = jnp.bfloat16 if extractor_dtype == "bfloat16" \
            else jnp.float32
        self._extractor_jnp_dtype = ex_dt
        cast_put = lambda t: None if t is None else jax.device_put(
            jax.tree_util.tree_map(
                lambda x: x.astype(ex_dt)
                if getattr(x, "dtype", None) == np.float32
                or getattr(x, "dtype", None) == jnp.float32 else x, t),
            dev)
        self.clip_params = cast_put(clip_params)
        self.emotion_text_embeds = emotion_text_embeds
        self.maxvit_params = cast_put(maxvit_params)

        rng = jax.random.PRNGKey(seed)
        L = MAX_SECONDS
        dummy = dict(
            x=jnp.zeros((1, L - 1), jnp.int32),
            sem=jnp.zeros((1, L, 768), jnp.float32),
            key=jnp.zeros((1, 1), jnp.float32),
            scene=jnp.zeros((1, L), jnp.float32),
            motion=jnp.zeros((1, L, motion_dim), jnp.float32),
            emo=jnp.zeros((1, L, 6), jnp.float32))
        self.variables = jax.jit(self.model.init)(
            {"params": rng}, dummy["x"], dummy["x"], dummy["x"],
            dummy["sem"], dummy["key"], dummy["scene"], dummy["motion"],
            dummy["emo"])
        self.reg_variables = jax.jit(self.model_reg.init)(
            {"params": jax.random.fold_in(rng, 1)}, dummy["sem"],
            dummy["scene"], dummy["motion"], dummy["emo"])
        self.load_checkpoints(amt_checkpoint, reg_checkpoint)

    def load_checkpoints(self, amt_checkpoint: Optional[str] = None,
                         reg_checkpoint: Optional[str] = None) -> None:
        """(Re)load model weights in place — the serving hot-reload hook.

        Compiled programs are keyed by shape/config, not weight values, so
        swapping params needs no recompile. NOT thread-safe against a
        concurrently running generate: route through
        ``DynamicBatcher.submit_control`` in serving (runs between
        batches on the worker thread)."""
        from ..train.checkpoint import load_params

        if amt_checkpoint:
            self.variables = dict(self.variables)
            self.variables["params"] = load_params(
                amt_checkpoint, self.variables["params"])
        if reg_checkpoint:
            self.reg_variables = dict(self.reg_variables)
            self.reg_variables["params"] = load_params(
                reg_checkpoint, self.reg_variables["params"])

    # ------------------------------------------------------------------
    @property
    def _feature_jits(self):
        """Jitted extractor programs, built ONCE per instance — a fresh
        ``jax.jit(lambda ...)`` per call would miss jit's function-identity
        cache and recompile CLIP/MaxViT on every video (measured: ~18 min
        of recompiles per warm extract_features call on v5e without this)."""
        jits = getattr(self, "_feature_jits_cache", None)
        if jits is None:
            from ..features.clip import (CLIP, clip_vit_l14_336_config,
                                         normalize_pixels)
            from ..features.maxvit import (MaxViT, maxvit_t_config,
                                           normalize_diff_pixels)

            clip_model = CLIP(cfg=self._clip_cfg
                              or clip_vit_l14_336_config())
            mv = MaxViT(cfg=self._maxvit_cfg or maxvit_t_config())
            dt = self._extractor_jnp_dtype
            # inputs arrive uint8 and normalize IN-GRAPH (4x less H2D
            # traffic than f32 pixels), cast to the extractor dtype so
            # bf16 kernels are not promoted back; text embeddings stay
            # f32 so the 6-way emotion logits/softmax run in f32; outputs
            # return f32 (hosts don't speak bf16)
            f32 = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), t)
            jits = self._feature_jits_cache = dict(
                clip=jax.jit(lambda v, p8, t: f32(clip_model.apply(
                    v, normalize_pixels(p8).astype(dt), t,
                    method=clip_model.semantic_and_emotion))),
                semantic=jax.jit(lambda v, p8: clip_model.apply(
                    v, normalize_pixels(p8).astype(dt),
                    method=clip_model.encode_image).astype(jnp.float32)),
                motion=jax.jit(lambda v, p8: mv.apply(
                    v, normalize_diff_pixels(p8).astype(dt)
                ).astype(jnp.float32)),
            )
        return jits

    def _extractor_image_sizes(self):
        """(clip_size, maxvit_size) input resolutions for the resize."""
        from ..features.clip import clip_vit_l14_336_config
        from ..features.maxvit import maxvit_t_config

        clip_cfg = self._clip_cfg or clip_vit_l14_336_config()
        mv_cfg = self._maxvit_cfg or maxvit_t_config()
        return clip_cfg.vision.image_size, mv_cfg.image_size

    @_gc_quiet
    def extract_features(self, video_path: str) -> Dict[str, np.ndarray]:
        """Video file -> feature dict (semantic, emotion, scene_offset,
        motion), each per-second, unpadded.

        Latency-engineered for single-clip serving (the reference runs
        one CLIP forward per frame per feature and a separate decode per
        script, video2music.py:144-237,298-335):

          * ONE streaming decode pass (``video_io.ClipStream``) computes
            scene scores inline and keeps only the frames extraction
            consumes — never the whole clip (the naive retain-everything
            path cost ~90 s/clip in GC pressure alone on a 1-core host);
          * extractor work is dispatched INSIDE the decode loop: every 30
            decoded seconds, a 30-frame CLIP chunk (and a 30-pair MaxViT
            chunk) ships to the TPU, so resize + H2D + device compute ride
            within the host decode wall-clock instead of after it — and
            every chunk shares the SAME compiled 30-frame program;
          * semantic + emotion come from ONE fused CLIP program
            (``semantic_and_emotion``) — one vision-tower pass, not two;
          * extractor weights/activations run bf16 by default
            (``extractor_dtype``).

        Per-stage wall-clock of the last call is left in
        ``self.last_extract_timings`` (seconds).
        """
        import time

        from ..features.clip import resize_crop_frames
        from ..features import scene as scene_mod
        from ..features.maxvit import (motion_diff_frames,
                                       resize_crop_diff_frames,
                                       scalar_motion)

        if self.clip_params is None or self.emotion_text_embeds is None:
            raise ValueError(
                "CLIP params / emotion text embeddings not loaded; pass "
                "features= to generate() or supply clip_params + "
                "emotion_text_embeds (export with tools/convert_clip.py)")
        if self.motion_type != 0 and self.maxvit_params is None:
            raise ValueError("maxvit_params required for motion_type>=1")
        T: Dict[str, float] = {}
        t0 = time.perf_counter()
        tick = lambda name: T.__setitem__(
            name, time.perf_counter() - t0)

        jits = self._feature_jits
        variables = {"params": self.clip_params}
        text = jnp.asarray(self.emotion_text_embeds, jnp.float32)
        clip_size, mv_size = self._extractor_image_sizes()
        CH = 30  # chunk size == the frame bucket unit

        buf_1fps: List[np.ndarray] = []
        buf_pairs: List[tuple] = []
        clip_devs: List[tuple] = []    # (device out, true length)
        motion_devs: List[tuple] = []
        all_pairs: List[tuple] = []    # only kept for motion_type=0
        n_sec = 0
        first_motion_chunk = True

        def flush_clip():
            nonlocal n_sec
            if not buf_1fps:
                return
            arr = resize_crop_frames(np.stack(buf_1fps), clip_size,
                                     backend=self.resize_backend)
            clip_devs.append((jits["clip"](
                variables, _pad_frame_bucket(jnp.asarray(arr)), text),
                arr.shape[0]))
            n_sec += arr.shape[0]
            buf_1fps.clear()

        def flush_motion():
            nonlocal first_motion_chunk
            if not buf_pairs:
                return
            # motion_diff_frames prepends the reference's leading zero
            # row — only the FIRST chunk keeps it
            diffs = motion_diff_frames(buf_pairs)
            if not first_motion_chunk:
                diffs = diffs[1:]
            first_motion_chunk = False
            arr = resize_crop_diff_frames(diffs, mv_size,
                                          backend=self.resize_backend)
            motion_devs.append((jits["motion"](
                {"params": self.maxvit_params},
                _pad_frame_bucket(jnp.asarray(arr))), arr.shape[0]))
            buf_pairs.clear()

        cs = video_io.ClipStream(video_path, MAX_SECONDS)
        for f1, pair in cs:
            if f1 is not None:
                buf_1fps.append(f1)
                if len(buf_1fps) == CH:
                    flush_clip()
            if pair is not None:
                if self.motion_type == 0:
                    all_pairs.append(pair)
                else:
                    buf_pairs.append(pair)
                    if len(buf_pairs) == CH:
                        flush_motion()
        flush_clip()
        flush_motion()
        tick("decode+dispatch")

        # scene ids from the streamed scores, then per-second offsets
        # (scores came from BGR frames — same HSV path as scenedetect)
        t0 = time.perf_counter()
        cuts = scene_mod.detect_cuts(scores=cs.scores)
        spans = scene_mod.scenes_from_cuts(cuts, cs.n_frames_capped,
                                           cs.fps)
        ids = scene_mod.scene_ids_per_second(spans, n_sec)
        # +1 shift matches both the training loader and the reference's
        # get_scene_offset_feature (int(sceneID)+1); 0 stays the PAD value
        scene_offset = np.asarray(scene_mod.scene_offsets(ids),
                                  np.float32) + 1.0
        tick("scene_decisions")

        t0 = time.perf_counter()
        if self.motion_type == 0:
            motion = scalar_motion(all_pairs)
        elif motion_devs:
            motion = np.concatenate(
                [np.asarray(d)[:n] for d, n in motion_devs])
        else:  # zero-pair clip (sub-second video): the legacy single-
            # dispatch path still ran MaxViT on the leading zero row;
            # that output is a constant, but run it once for parity
            diffs = motion_diff_frames([])
            arr = resize_crop_diff_frames(diffs, mv_size,
                                          backend=self.resize_backend)
            motion = np.asarray(jits["motion"](
                {"params": self.maxvit_params},
                _pad_frame_bucket(jnp.asarray(arr))))[:arr.shape[0]]
        semantic = np.concatenate(
            [np.asarray(d[0])[:n] for d, n in clip_devs]) \
            if clip_devs else np.zeros((0, 768), np.float32)
        emotion = np.concatenate(
            [np.asarray(d[1])[:n] for d, n in clip_devs]) \
            if clip_devs else np.zeros((0, 6), np.float32)
        tick("device_fetch")
        self.last_extract_timings = T
        return {"semantic": semantic, "emotion": emotion,
                "scene_offset": scene_offset, "motion": motion}

    @_gc_quiet
    def extract_features_batch(self, video_paths) -> List[Dict[str, np.ndarray]]:
        """Feature extraction for SEVERAL clips through SHARED extractor
        programs — the serving-side analogue of ``generate_batch``.

        Frames are a batch dimension for CLIP/MaxViT, so concurrent clips'
        frames concatenate into one stream and run as full ~300-frame
        programs instead of one short program per clip (matches-and-beats
        target: the reference runs ONE frame per forward,
        video2music.py:160-165). Host video decode runs in a small thread
        pool (cv2 releases the GIL during decode), scene decisions overlap
        the dispatched device programs, and results are sliced back per
        clip. Returns one ``extract_features``-shaped dict per path;
        numerics are identical to per-clip extraction (same compiled
        programs, frames independent along the batch axis).
        """
        import time
        from concurrent.futures import ThreadPoolExecutor

        from ..features.clip import resize_crop_frames
        from ..features import scene as scene_mod
        from ..features.maxvit import (motion_diff_frames,
                                       resize_crop_diff_frames,
                                       scalar_motion)

        if not video_paths:
            return []
        if self.clip_params is None or self.emotion_text_embeds is None:
            raise ValueError(
                "CLIP params / emotion text embeddings not loaded")
        T: Dict[str, float] = {}
        t0 = time.perf_counter()
        tick = lambda name: T.__setitem__(name, time.perf_counter() - t0)

        with ThreadPoolExecutor(min(4, len(video_paths))) as pool:
            streams = list(pool.map(
                lambda p: video_io.stream_clip(p, MAX_SECONDS), video_paths))
        tick("decode+scene_scores")

        jits = self._feature_jits
        variables = {"params": self.clip_params}
        text = jnp.asarray(self.emotion_text_embeds, jnp.float32)
        clip_size, mv_size = self._extractor_image_sizes()

        # concatenate every clip's 1fps frames into one stream, dispatch
        # in MAX_SECONDS chunks (each padded to the shared 30-frame
        # buckets), slice back per clip below
        t0 = time.perf_counter()
        pix = [resize_crop_frames(s["frames_1fps"], clip_size,
                                  backend=self.resize_backend)
               for s in streams]
        n_secs = [p.shape[0] for p in pix]
        all_pix = np.concatenate(pix, axis=0)
        chunks = [all_pix[s:s + MAX_SECONDS]
                  for s in range(0, all_pix.shape[0], MAX_SECONDS)]
        # (program output, true chunk length) — bucket padding is sliced
        # off at fetch so concatenation has no padding inside
        clip_devs = [
            (jits["clip"](variables, _pad_frame_bucket(jnp.asarray(c)),
                          text), c.shape[0])
            for c in chunks]
        tick("resize+clip_dispatch")

        t0 = time.perf_counter()
        scene_offsets = []
        for s, n_sec in zip(streams, n_secs):
            cuts = scene_mod.detect_cuts(scores=s["scores"])
            spans = scene_mod.scenes_from_cuts(cuts, s["n_frames_capped"],
                                               s["fps"])
            ids = scene_mod.scene_ids_per_second(spans, n_sec)
            scene_offsets.append(np.asarray(
                scene_mod.scene_offsets(ids), np.float32) + 1.0)
        tick("scene_decisions")

        t0 = time.perf_counter()
        motions: List[Optional[np.ndarray]] = [None] * len(streams)
        motion_devs = []
        # per-clip motion row counts: motion_diff_frames yields
        # len(pairs)+1 rows (the reference's leading zero row per clip)
        n_mrows = [len(s["pairs"]) + 1 for s in streams]
        if self.motion_type == 0:
            for i, s in enumerate(streams):
                motions[i] = scalar_motion(s["pairs"])
        else:
            if self.maxvit_params is None:
                raise ValueError("maxvit_params required for motion_type>=1")
            diffs = [d for s in streams
                     for d in motion_diff_frames(s["pairs"])]
            all_diff = resize_crop_diff_frames(
                diffs, mv_size, backend=self.resize_backend)
            motion_devs = [
                (jits["motion"]({"params": self.maxvit_params},
                                _pad_frame_bucket(jnp.asarray(c))),
                 c.shape[0])
                for c in (all_diff[s:s + MAX_SECONDS]
                          for s in range(0, all_diff.shape[0], MAX_SECONDS))]
        tick("motion_prep+dispatch")

        t0 = time.perf_counter()
        sem = np.concatenate([np.asarray(d[0])[:n] for d, n in clip_devs])
        emo = np.concatenate([np.asarray(d[1])[:n] for d, n in clip_devs])
        if motion_devs:
            mot = np.concatenate([np.asarray(d)[:n]
                                  for d, n in motion_devs])
        tick("device_fetch")
        self.last_extract_timings = T

        results = []
        off = moff = 0
        for i, n_sec in enumerate(n_secs):
            motion = motions[i]
            if motion is None:
                motion = mot[moff:moff + n_mrows[i]]
                moff += n_mrows[i]
            results.append({
                "semantic": sem[off:off + n_sec],
                "emotion": emo[off:off + n_sec],
                "scene_offset": scene_offsets[i],
                "motion": motion,
            })
            off += n_sec
        return results

    # ------------------------------------------------------------------
    def generate(self, video: Optional[str] = None,
                 primer: Optional[str] = "", key: Optional[str] = None,
                 transposition_value: int = 0,
                 custom_sound_font: bool = False, temperature: float = 1.0,
                 *, features: Optional[Dict[str, np.ndarray]] = None,
                 output_dir: str = "./output", seed: int = 0,
                 correct_panning: bool = False,
                 sound_font: Optional[str] = None,
                 caption_overlays=None,
                 compute_dtype: str = "bfloat16",
                 quantize: Optional[str] = None) -> GenerateResult:
        os.makedirs(output_dir, exist_ok=True)
        if features is None:
            if video is None:
                raise ValueError("need a video path or precomputed features")
            features = self.extract_features(video)

        L = MAX_SECONDS
        n_sec = min(int(features["semantic"].shape[0]), L)
        semantic = _pad_to(np.asarray(features["semantic"], np.float32), L)
        emotion = _pad_to(np.asarray(features["emotion"], np.float32), L)
        scene_offset = _pad_to(
            np.asarray(features["scene_offset"], np.float32), L)
        motion = _pad_to(np.asarray(features["motion"], np.float32), L)

        # key / primer resolution — the flat argmax reproduces the
        # reference's torch.argmax-without-dim (video2music.py:722)
        key, key_feature, primer = resolve_key_and_primer(
            key, primer, emotion)
        primer_ids, primer_roots, primer_attrs = parse_primer(primer)

        emotion = smooth_emotion(emotion)

        # temperature is a TRACED argument of the compiled program, not a
        # GenerateConfig field: it only divides logits, and baking it into
        # the jit cache key would recompile per distinct float (minutes on
        # the real TPU) and grow the cache without bound.
        gcfg = GenerateConfig(target_seq_length=L, max_conseq_N=0,
                              max_conseq_chord=2)
        P = len(primer_ids)
        pad_primer = lambda a, pad: np.concatenate(
            [a, np.full(L - len(a), pad, np.int32)])[None]
        # TPU inference default: bf16 weights/activations (matmuls on the
        # MXU at full rate), fp32 softmax inside the sampler. Pass
        # compute_dtype="float32" for bit-parity with training.
        variables, reg_variables = self.variables, self.reg_variables
        feat_dt = jnp.float32
        if compute_dtype == "bfloat16":
            variables, reg_variables = self._bf16_variables()
            feat_dt = jnp.bfloat16  # f32 inputs would promote kernels back
        out = self._jitted_generate(gcfg, P, quantize)(
            variables, reg_variables,
            dict(semantic=jnp.asarray(semantic, feat_dt)[None],
                 key=jnp.asarray([[key_feature]], feat_dt),
                 scene_offset=jnp.asarray(scene_offset, feat_dt)[None],
                 motion=jnp.asarray(motion, feat_dt)[None],
                 emotion=jnp.asarray(emotion, feat_dt)[None],
                 primer=jnp.asarray(pad_primer(primer_ids, C.CHORD_PAD)),
                 primer_root=jnp.asarray(
                     pad_primer(primer_roots, C.CHORD_ROOT_PAD)),
                 primer_attr=jnp.asarray(
                     pad_primer(primer_attrs, C.CHORD_ATTR_PAD))),
            jnp.asarray([[temperature]], jnp.float32),
            jax.random.PRNGKey(seed))

        # full-array fetches: indexing [0] first would dispatch a slice
        # program per array before the D2H (B=1, same bytes either way)
        return self._postprocess(
            np.asarray(out["gen_seq"])[0],
            np.asarray(out["ln_nd"], np.float32)[0],
            np.asarray(out["instrument"], np.float32)[0], emotion, n_sec,
            key, transposition_value, output_dir, video, correct_panning,
            sound_font, caption_overlays)

    def _postprocess(self, chord_ids, ln_nd, inst_probs, emotion, n_sec,
                     key, transposition_value, output_dir, video,
                     correct_panning, sound_font, caption_overlays
                     ) -> GenerateResult:
        """Host-side symbolic rendering of one clip's decoded arrays
        (reference: video2music.py:849-1052). Shared by generate() and
        generate_batch()."""
        os.makedirs(output_dir, exist_ok=True)
        chord_ids = chord_ids[:n_sec]
        ln_nd = ln_nd[:n_sec]
        inst_probs = inst_probs[:n_sec]

        # post-processing (reference: video2music.py:849-933)
        note_density = np.clip(np.round(ln_nd[:, 0]), 0, 40).astype(int)
        loudness_lv = np.clip((ln_nd[:, 1] * 100).astype(int), 0, 50)
        emotion_idx = np.argmax(emotion[:n_sec], axis=1)
        velocities = [velocity_from_loudness(loudness_lv[i], emotion_idx[i])
                      for i in range(n_sec)]
        densities = [density_bucket(note_density[i], emotion_idx[i])
                     for i in range(n_sec)]
        inst_bin = (inst_probs >= INSTRUMENT_THRESHOLD).astype(np.float32)

        inv = chord_inv_dict()
        chords = [inv.get(int(i), "N") for i in chord_ids]
        offsets = chord_offsets(chords)
        midi_chords = voice([
            [] if s == "N" else Chord(s.replace(":", "")).getMIDI(
                key[0].lower(), 4)
            for s in chords])
        trans = TRANSPOSE_KEY.get(key, transposition_value)

        midi_path = os.path.join(output_dir, "output.mid")
        stems_dir = os.path.join(output_dir, "stems")
        # Native fast path: the whole note-emission + SMF-assembly loop in
        # one C call (native/v2m_native.cpp:v2m_render_clip) —
        # byte-identical to the Python loop below (tests/test_native.py),
        # ~25x faster on the 1-core serving host where this loop was 45%+
        # of the per-clip render wall-clock.
        rendered = _native.render_clip(
            midi_chords, offsets, densities, velocities,
            np.isin(emotion_idx, (0, 1, 2)), inst_bin,
            arp_inst=_INST_POLICY["arp"], vel_factor=_INST_POLICY["vel"],
            pan_ctrl=(_INST_POLICY["pan_ctrl_correct"] if correct_panning
                      else _INST_POLICY["pan_ctrl_quirk"]),
            pan_param=(_INST_POLICY["pan_param_correct"] if correct_panning
                       else _INST_POLICY["pan_param_quirk"]),
            chord_dur=CHORD_DURATION_BEATS, tempo=BASE_TEMPO)
        if rendered is not None:
            main_bytes, stem_bytes = rendered
            with open(midi_path, "wb") as f:
                f.write(main_bytes)
            os.makedirs(stems_dir, exist_ok=True)
            for inst_id, data in stem_bytes.items():
                with open(os.path.join(stems_dir,
                                       f"inst_{inst_id:02d}.mid"),
                          "wb") as f:
                    f.write(data)
        else:  # pure-Python fallback (no toolchain): identical output
            generated = MIDIFile(1)
            generated.addTempo(0, 0, BASE_TEMPO)
            track_files: Dict[int, MIDIFile] = {}
            for i, chord in enumerate(midi_chords):
                add_chord(generated, chord, offsets[i], densities[i], trans,
                          i * CHORD_DURATION_BEATS, CHORD_DURATION_BEATS,
                          velocities[i], int(emotion_idx[i]),
                          arpeggio_chord=True)
                for inst_id in np.nonzero(inst_bin[i])[0]:
                    inst_id = int(inst_id)
                    if inst_id not in track_files:
                        mf = MIDIFile(1)
                        mf.addTempo(0, 0, BASE_TEMPO)
                        pan = (PAN_VALS["left"] if inst_id in LEFT_PAN else
                               PAN_VALS["center"] if inst_id in CENTER_PAN
                               else PAN_VALS["right"])
                        if correct_panning:
                            mf.addControllerEvent(0, 0, 0, 10, pan)
                        else:
                            # reference quirk: pan value as controller number
                            mf.addControllerEvent(0, 0, 0, pan, 0)
                        track_files[inst_id] = mf
                    arp = (inst_id in ARPEGGIO_INSTRUMENTS
                           or int(emotion_idx[i]) in (0, 1, 2))
                    vel = velocities[i] * (
                        1.15 if inst_id in LOW_VELOCITY_INSTRUMENTS else 1.0)
                    add_chord(track_files[inst_id], chord, offsets[i],
                              densities[i], trans, i * CHORD_DURATION_BEATS,
                              CHORD_DURATION_BEATS, vel, int(emotion_idx[i]),
                              arpeggio_chord=arp)
            with open(midi_path, "wb") as f:
                generated.writeFile(f)
            # per-instrument stems alongside (custom-soundfont mixes)
            os.makedirs(stems_dir, exist_ok=True)
            for inst_id, mf in track_files.items():
                with open(os.path.join(stems_dir,
                                       f"inst_{inst_id:02d}.mid"),
                          "wb") as f:
                    mf.writeFile(f)
        np.savetxt(os.path.join(output_dir, "inst.csv"), inst_bin,
                   delimiter=",", fmt="%.0f")

        audio_path = None
        out_video = None
        if video_io.has_fluidsynth():
            audio_path = os.path.join(output_dir, "output.flac")
            video_io.midi_to_audio(midi_path, audio_path, sound_font)
            if video is not None and video_io.has_ffmpeg():
                out_video = os.path.join(output_dir, "output.mp4")
                # caption_overlays: timed captions burned in via ffmpeg
                # drawtext (the generate-CLI passes the reference's
                # Prime/Generated Chords pair, generate.py:700-703)
                video_io.mux_audio_onto_video(video, audio_path, out_video,
                                              overlays=caption_overlays)

        return GenerateResult(
            chords=chords, chord_ids=chord_ids, midi_path=midi_path,
            audio_path=audio_path, video_path=out_video,
            densities=densities, velocities=velocities,
            instruments=inst_bin, key=key)

    def generate_batch(self, requests, *, output_dir: str = "./output",
                       temperature=1.0, seed: int = 0,
                       correct_panning: bool = False,
                       compute_dtype: str = "bfloat16",
                       quantize: Optional[str] = None,
                       kv_quant: Optional[str] = None,
                       n_real: Optional[int] = None,
                       on_decoded=None, defer_render: bool = False):
        """Batched serving: decode B clips in ONE compiled program.

        The per-token decode step is latency-bound at B=1 (the kernels'
        serial compute, not bandwidth), so rows are nearly free: measured
        on TPU v5e, B=64 sustains ~46k tok/s aggregate (~6.5 ms/clip,
        fused batched kernels + cache segmentation) vs ~16.7k tok/s for
        pipelined B=1 calls. Clips with different primers
        and temperatures share the program: primer lengths and the
        sampling temperature are per-element traced inputs, not part of
        the compiled program.

        Args:
          requests: list of dicts — ``features`` (required, the
            ``extract_features`` dict), optional ``primer``, ``key``,
            ``transposition_value``, ``video``, ``sound_font``,
            ``caption_overlays``, ``output_dir``.
          temperature: one float for the whole batch, or a sequence of
            per-request floats (len == len(requests)).
          kv_quant: None or "int8" — int8 KV caches on the batched fused
            decode (decode/sampler.py): halves resident KV-cache HBM for
            memory-bound serving (bigger max batch); measured ~5% SLOWER
            than bf16 caches at B=32 (see generate_chords docstring).
            Quantized numerics (~1e-2 relative logits error); opt-in.
          n_real: if set, only the first ``n_real`` requests are real —
            the rest are shape-padding clones (the DynamicBatcher's
            bucketing); they decode on-device but skip the host-side
            MIDI/audio render, and only ``n_real`` results are returned.
          on_decoded: optional ``fn(i, {"chords", "chord_ids", "key"})``
            called per real request as soon as the decode fetch lands —
            BEFORE any host-side MIDI/audio rendering. Streaming serving
            uses this to push chords to the client while renders run.
          defer_render: if True, return a zero-arg callable instead of
            the results — calling it runs the host-side MIDI/audio
            renders and returns the results list. The decode is fetched
            and ``on_decoded`` has fired by the time generate_batch
            returns, so a serving layer can hand the closure to a render
            thread and immediately dispatch the NEXT batch's decode: the
            render (the serving host floor, ~0.06 s/clip on this 1-core
            host) then overlaps the next batch's device decode + D2H
            fetch. The closure touches only fetched host arrays and
            module-level constants — it never reads model state, so it
            cannot race a checkpoint hot-reload or the next decode.
        Returns:
          list of GenerateResult, one per (real) request (host-side
          MIDI/audio rendering runs per clip, as in generate()); or the
          render closure when ``defer_render``.
        """
        if not requests:
            # honour the defer_render contract even for empty input: the
            # caller expects a zero-arg closure, not a list
            return (lambda: []) if defer_render else []
        if n_real is None:
            n_real = len(requests)
        L = MAX_SECONDS
        prepped = []
        for i, req in enumerate(requests):
            features = req["features"]
            n_sec = min(int(features["semantic"].shape[0]), L)
            emotion = _pad_to(np.asarray(features["emotion"], np.float32), L)
            key, key_feature, primer = resolve_key_and_primer(
                req.get("key"), req.get("primer", ""), emotion)
            ids, roots, attrs = parse_primer(primer)
            prepped.append(dict(
                n_sec=n_sec, key=key, key_feature=key_feature,
                semantic=_pad_to(
                    np.asarray(features["semantic"], np.float32), L),
                emotion=smooth_emotion(emotion),
                scene_offset=_pad_to(
                    np.asarray(features["scene_offset"], np.float32), L),
                motion=_pad_to(np.asarray(features["motion"], np.float32),
                               L),
                primer_ids=ids, primer_roots=roots, primer_attrs=attrs,
                out_dir=req.get("output_dir",
                                os.path.join(output_dir, f"clip_{i:03d}"))))

        gcfg = GenerateConfig(target_seq_length=L, max_conseq_N=0,
                              max_conseq_chord=2)
        temps = np.asarray(temperature, np.float32).reshape(-1)
        if temps.shape[0] == 1:
            temps = np.repeat(temps, len(requests))
        if temps.shape[0] != len(requests):
            raise ValueError(
                f"temperature: expected 1 or {len(requests)} values, got "
                f"{temps.shape[0]}")
        pad_primer = lambda a, pad: np.concatenate(
            [np.asarray(a, np.int32), np.full(L - len(a), pad, np.int32)])
        variables, reg_variables = self.variables, self.reg_variables
        feat_dt = jnp.float32
        if compute_dtype == "bfloat16":
            variables, reg_variables = self._bf16_variables()
            feat_dt = jnp.bfloat16
        stack = lambda k, dt: jnp.asarray(
            np.stack([p[k] for p in prepped]), dt)
        feats = dict(
            semantic=stack("semantic", feat_dt),
            key=jnp.asarray([[p["key_feature"]] for p in prepped], feat_dt),
            scene_offset=stack("scene_offset", feat_dt),
            motion=stack("motion", feat_dt),
            emotion=stack("emotion", feat_dt),
            primer=jnp.asarray(np.stack(
                [pad_primer(p["primer_ids"], C.CHORD_PAD)
                 for p in prepped])),
            primer_root=jnp.asarray(np.stack(
                [pad_primer(p["primer_roots"], C.CHORD_ROOT_PAD)
                 for p in prepped])),
            primer_attr=jnp.asarray(np.stack(
                [pad_primer(p["primer_attrs"], C.CHORD_ATTR_PAD)
                 for p in prepped])))
        num_primer = jnp.asarray(
            [[len(p["primer_ids"])] for p in prepped], jnp.int32)

        cache = getattr(self, "_gen_cache", None)
        if cache is None:
            cache = self._gen_cache = {}
        ck = ("batch", gcfg, quantize, kv_quant)
        if ck not in cache:
            cache[ck] = jax.jit(
                lambda v, rv, feats, np_, temp, rng: self._generate_jit(
                    v, rv, feats, rng, gcfg, np_, quantize,
                    temperature=temp, kv_quant=kv_quant))
        out = cache[ck](variables, reg_variables, feats, num_primer,
                        jnp.asarray(temps[:, None]), jax.random.PRNGKey(seed))

        # fetch each result array ONCE for the whole batch — indexing the
        # device array per clip dispatches a slice program AND pays a D2H
        # round-trip per (clip, array): 3B fetches vs 3 (measured ~0.11 s
        # per clip through the remote-TPU tunnel, the largest host-side
        # cost of a serving batch). gen_seq lands first so streaming
        # callbacks fire before the regression fetches and renders.
        gen_host = np.asarray(out["gen_seq"])
        if on_decoded is not None:
            inv = chord_inv_dict()
            for i, p in enumerate(prepped[:n_real]):
                ids = gen_host[i][:p["n_sec"]]
                on_decoded(i, {
                    "chords": [inv.get(int(c), "N") for c in ids],
                    "chord_ids": ids, "key": p["key"]})

        ln_host = np.asarray(out["ln_nd"], np.float32)
        inst_host = np.asarray(out["instrument"], np.float32)

        def render():
            results = []
            for i, (req, p) in enumerate(zip(requests[:n_real],
                                             prepped[:n_real])):
                results.append(self._postprocess(
                    gen_host[i], ln_host[i], inst_host[i],
                    p["emotion"], p["n_sec"], p["key"],
                    req.get("transposition_value", 0), p["out_dir"],
                    req.get("video"), correct_panning,
                    req.get("sound_font"), req.get("caption_overlays")))
            return results

        return render if defer_render else render()

    # ------------------------------------------------------------------
    def _bf16_variables(self):
        """bf16-cast model + regression variables, cached per source tree.

        The cast is cheap device-side, but ``tree_map(astype)`` dispatches
        one convert program per LEAF (~420 tiny RPCs through a remote-TPU
        tunnel — measured ~0.15 s per generate_batch call), so the cast
        trees are built once and reused until ``load_checkpoints`` swaps
        the source trees (identity-checked; the cache holds the sources,
        so the identity stays valid)."""
        cached = getattr(self, "_bf16_cache", None)
        if (cached is not None and cached[0] is self.variables
                and cached[1] is self.reg_variables):
            return cached[2], cached[3]
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t)
        out = (cast(self.variables), cast(self.reg_variables))
        self._bf16_cache = (self.variables, self.reg_variables) + out
        return out

    def _jitted_generate(self, gcfg, num_primer, quantize=None):
        """Compiled decode+regression program, cached per (gcfg, P, quant).

        quantize="int8": weight-only int8 decode (decode/sampler.py) — the
        fused kernels read int8 weights, halving the HBM traffic that
        bounds the per-token step."""
        cache = getattr(self, "_gen_cache", None)
        if cache is None:
            cache = self._gen_cache = {}
        key = (gcfg, num_primer, quantize)
        if key not in cache:
            cache[key] = jax.jit(
                lambda v, rv, feats, temp, rng: self._generate_jit(
                    v, rv, feats, rng, gcfg, num_primer, quantize,
                    temperature=temp))
        return cache[key]

    def _generate_jit(self, variables, reg_variables, feats, rng, gcfg,
                      num_primer, quantize=None, temperature=None,
                      kv_quant=None):
        """One traced program: chord decode + regression forward."""
        out = generate_chords(
            self.model, variables, semantic=feats["semantic"],
            key=feats["key"], scene_offset=feats["scene_offset"],
            motion=feats["motion"], emotion=feats["emotion"],
            primer=feats["primer"], primer_root=feats["primer_root"],
            primer_attr=feats["primer_attr"], num_primer=num_primer,
            rng=rng, gcfg=gcfg, temperature=temperature, quantize=quantize,
            kv_quant=kv_quant)
        (ln_nd, inst), _ = self.model_reg.apply(
            reg_variables, feats["semantic"], feats["scene_offset"],
            feats["motion"], feats["emotion"], deterministic=True,
            mutable=["moe_state", "metrics"])
        out["ln_nd"] = ln_nd
        out["instrument"] = inst
        return out
