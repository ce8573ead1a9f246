"""CLI: dataset feature extraction
(``python -m video2music_tpu.cli.extract_features <kind> ...``).

One entry point covering the reference's per-feature scripts
(reference: ``script/semantic_feature.py``, ``emotion_feature.py``,
``motion_feature.py``, ``scene_feature.py``, ``scene_offset_feature.py``,
``loudness_feature.py``, ``note_density_feature.py``,
``thresholding_instrument.py``, ``video2jpg.py``). Each subcommand reads
videos/audio/midi under the dataset root and writes the same .lab/.npy/.csv
layouts the data pipeline consumes. CLIP/MaxViT subcommands batch ALL frames
into one jitted forward (the reference runs one frame per forward).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..core import constants as C


def _videos_in(d):
    return sorted(f for f in os.listdir(d)
                  if f.rsplit(".", 1)[-1].lower() in ("mp4", "mkv", "webm",
                                                      "avi", "mov"))


def cmd_semantic(args):
    import jax, jax.numpy as jnp
    from ..features.clip import CLIP, clip_vit_l14_336_config, preprocess_frames
    from ..pipeline.video_io import read_frames

    params = dict(np.load(args.clip_params, allow_pickle=True))["params"] \
        if args.clip_params.endswith(".npz") else np.load(
            args.clip_params, allow_pickle=True).item()
    model = CLIP(cfg=clip_vit_l14_336_config())
    encode = jax.jit(lambda v, p: model.apply(v, p,
                                              method=model.encode_image))
    os.makedirs(args.out_dir, exist_ok=True)
    for fname in _videos_in(args.video_dir):
        vid = os.path.splitext(fname)[0]
        frames, _, _, _ = read_frames(os.path.join(args.video_dir, fname))
        feats = np.asarray(encode({"params": params},
                                  jnp.asarray(preprocess_frames(frames))))
        np.save(os.path.join(args.out_dir, vid + ".npy"), feats)
        print(vid, feats.shape)


def cmd_emotion(args):
    import jax, jax.numpy as jnp
    from ..features.clip import CLIP, clip_vit_l14_336_config, preprocess_frames
    from ..pipeline.video_io import read_frames

    params = np.load(args.clip_params, allow_pickle=True).item()
    text_embeds = np.load(args.text_embeds)
    model = CLIP(cfg=clip_vit_l14_336_config())
    probs_fn = jax.jit(lambda v, p, t: model.apply(
        v, p, t, method=model.emotion_probs))
    os.makedirs(args.out_dir, exist_ok=True)
    header = ("time exciting_prob fearful_prob tense_prob sad_prob "
              "relaxing_prob neutral_prob")
    for fname in _videos_in(args.video_dir):
        vid = os.path.splitext(fname)[0]
        frames, _, _, _ = read_frames(os.path.join(args.video_dir, fname))
        probs = np.asarray(probs_fn({"params": params},
                                    jnp.asarray(preprocess_frames(frames)),
                                    jnp.asarray(text_embeds)))
        with open(os.path.join(args.out_dir, vid + ".lab"), "w") as f:
            f.write(header + "\n")
            for i, row in enumerate(probs):
                f.write(f"{i} " + " ".join(format(p, ".4f")
                                           for p in row) + "\n")
        print(vid, probs.shape)


def cmd_scene(args):
    import cv2
    from ..features import scene as S
    from ..pipeline.video_io import read_frames

    os.makedirs(args.out_dir, exist_ok=True)
    offset_dir = args.offset_dir or args.out_dir
    os.makedirs(offset_dir, exist_ok=True)
    for fname in _videos_in(args.video_dir):
        vid = os.path.splitext(fname)[0]
        _, frames_all, fps, _ = read_frames(
            os.path.join(args.video_dir, fname))
        rgb = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
                        for f in frames_all])
        cuts = S.detect_cuts(rgb)
        spans = S.scenes_from_cuts(cuts, len(frames_all), fps)
        n_sec = int(np.ceil(len(frames_all) / fps))
        ids = S.scene_ids_per_second(spans, n_sec)
        with open(os.path.join(args.out_dir, vid + ".lab"), "w") as f:
            for i, sid in enumerate(ids):
                f.write(f"{i} {sid}\n")
        offs = S.scene_offsets(ids)
        with open(os.path.join(offset_dir, vid + ".lab"), "w") as f:
            for i, o in enumerate(offs):
                f.write(f"{i} {o}\n")
        print(vid, len(spans), "scenes")


def cmd_motion(args):
    from ..features.maxvit import scalar_motion
    from ..pipeline.video_io import read_frames, second_boundary_pairs

    os.makedirs(args.out_dir, exist_ok=True)
    for fname in _videos_in(args.video_dir):
        vid = os.path.splitext(fname)[0]
        _, frames_all, fps, _ = read_frames(
            os.path.join(args.video_dir, fname))
        pairs = second_boundary_pairs(frames_all, fps)
        if args.motion_type == 0:
            vals = scalar_motion(pairs)
            with open(os.path.join(args.out_dir, vid + ".lab"), "w") as f:
                for i, v in enumerate(vals):
                    f.write(f"{i} {v:.4f}\n")
        else:
            import jax, jax.numpy as jnp
            from ..features.maxvit import (MaxViT, maxvit_t_config,
                                           motion_diff_frames,
                                           preprocess_diff_frames)
            params = np.load(args.maxvit_params, allow_pickle=True).item()
            model = MaxViT(cfg=maxvit_t_config())
            diffs = motion_diff_frames(pairs)
            feats = np.asarray(jax.jit(model.apply)(
                {"params": params},
                jnp.asarray(preprocess_diff_frames(diffs))))
            np.save(os.path.join(args.out_dir, vid + ".npy"), feats)
        print(vid)


def cmd_loudness(args):
    from ..features.audio import (load_wav_mono, loudness_per_second,
                                  write_lab)

    os.makedirs(args.out_dir, exist_ok=True)
    for fname in sorted(os.listdir(args.wav_dir)):
        if not fname.endswith(".wav"):
            continue
        vid = os.path.splitext(fname)[0]
        samples = load_wav_mono(os.path.join(args.wav_dir, fname))
        write_lab(os.path.join(args.out_dir, vid + ".lab"),
                  loudness_per_second(samples))
        print(vid)


def cmd_note_density(args):
    from ..features.audio import note_density_per_second, write_lab

    os.makedirs(args.out_dir, exist_ok=True)
    for fname in sorted(os.listdir(args.midi_dir)):
        if not fname.endswith((".mid", ".midi")):
            continue
        vid = os.path.splitext(fname)[0]
        write_lab(os.path.join(args.out_dir, vid + ".lab"),
                  note_density_per_second(os.path.join(args.midi_dir,
                                                       fname)))
        print(vid)


def cmd_threshold_instrument(args):
    """Tag probabilities csv -> binary csv at threshold 0.1
    (reference: script/thresholding_instrument.py:20-29)."""
    import csv as csvmod

    os.makedirs(args.out_dir, exist_ok=True)
    for fname in sorted(os.listdir(args.prob_dir)):
        if not fname.endswith(".csv"):
            continue
        with open(os.path.join(args.prob_dir, fname)) as f:
            rows = list(csvmod.reader(f))
        header, data = rows[0], np.asarray(rows[1:], np.float32)
        binary = (data >= args.threshold).astype(int)
        with open(os.path.join(args.out_dir, fname), "w", newline="") as f:
            w = csvmod.writer(f)
            w.writerow(header)
            w.writerows(binary.tolist())
        print(fname)


def build_parser():
    p = argparse.ArgumentParser(description="Feature extraction")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("semantic")
    s.add_argument("-video_dir", required=True)
    s.add_argument("-out_dir", required=True)
    s.add_argument("-clip_params", required=True)
    s.set_defaults(fn=cmd_semantic)

    s = sub.add_parser("emotion")
    s.add_argument("-video_dir", required=True)
    s.add_argument("-out_dir", required=True)
    s.add_argument("-clip_params", required=True)
    s.add_argument("-text_embeds", required=True)
    s.set_defaults(fn=cmd_emotion)

    s = sub.add_parser("scene")
    s.add_argument("-video_dir", required=True)
    s.add_argument("-out_dir", required=True)
    s.add_argument("-offset_dir", default=None)
    s.set_defaults(fn=cmd_scene)

    s = sub.add_parser("motion")
    s.add_argument("-video_dir", required=True)
    s.add_argument("-out_dir", required=True)
    s.add_argument("-motion_type", type=int, default=0)
    s.add_argument("-maxvit_params", default=None)
    s.set_defaults(fn=cmd_motion)

    s = sub.add_parser("loudness")
    s.add_argument("-wav_dir", required=True)
    s.add_argument("-out_dir", required=True)
    s.set_defaults(fn=cmd_loudness)

    s = sub.add_parser("note_density")
    s.add_argument("-midi_dir", required=True)
    s.add_argument("-out_dir", required=True)
    s.set_defaults(fn=cmd_note_density)

    s = sub.add_parser("threshold_instrument")
    s.add_argument("-prob_dir", required=True)
    s.add_argument("-out_dir", required=True)
    s.add_argument("-threshold", type=float, default=0.1)
    s.set_defaults(fn=cmd_threshold_instrument)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
