"""Observability tests: expert-emotion counts, MaxVio log, plots, key detection."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video2music_tpu.core.config import amt_config
from video2music_tpu.models import VideoMusicTransformer
from video2music_tpu.obs import (MaxVioLog, collect_moe_metrics,
                                 plot_expert_emotion_heatmaps,
                                 save_expert_emotion)


@pytest.fixture(scope="module")
def moe_eval_metrics():
    cfg = amt_config("2.2", n_layers=2, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=12, max_seq_chord=12, total_vf_dim=11,
                     dropout=0.0)
    model = VideoMusicTransformer(cfg=cfg)
    rng = np.random.default_rng(0)
    B, L = 2, 12
    emotion = rng.uniform(size=(B, L, 2)).astype(np.float32)
    emotion[0, -2:] = 0.0  # PAD rows -> emotion id -1, excluded from counts
    args = (jnp.asarray(rng.integers(0, 100, (B, L - 1))),
            jnp.asarray(rng.integers(0, 13, (B, L - 1))),
            jnp.asarray(rng.integers(0, 14, (B, L - 1))),
            jnp.asarray(rng.standard_normal((B, L, 7)).astype(np.float32)),
            jnp.ones((B, 1), jnp.float32),
            jnp.asarray(rng.integers(0, 5, (B, L)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)),
            jnp.asarray(emotion))
    variables = model.init({"params": jax.random.PRNGKey(0)}, *args)
    _, mutated = model.apply(variables, *args, deterministic=True,
                             mutable=["moe_state", "metrics"])
    return mutated["metrics"]


def test_expert_emotion_counts_present(moe_eval_metrics):
    layers = collect_moe_metrics(moe_eval_metrics)
    ee = [v for v in layers.values() if "expert_emotion_counts" in v]
    assert len(ee) >= 2  # encoder + decoder deep MoE layers
    counts = ee[0]["expert_emotion_counts"]
    assert counts.shape == (6, 6)
    assert counts.sum() > 0
    # top-2 routing: each counted token contributes 2 selections
    assert counts.sum() % 2 == 0


def test_save_and_plot_expert_emotion(moe_eval_metrics, tmp_path):
    paths = save_expert_emotion(moe_eval_metrics, out_dir=str(tmp_path))
    assert len(paths) >= 2
    with open(paths[0]) as f:
        data = json.load(f)
    assert len(data["counts"]) == 6
    pngs = plot_expert_emotion_heatmaps(moe_eval_metrics,
                                        out_dir=str(tmp_path))
    assert all(os.path.getsize(p) > 1000 for p in pngs)


def test_maxvio_log(moe_eval_metrics, tmp_path):
    log = MaxVioLog()
    log.update(moe_eval_metrics)
    log.update(moe_eval_metrics)
    p = log.save(str(tmp_path / "maxvio.npy"))
    arr = np.load(p)
    assert arr.ndim == 1 and len(arr) > 0
    assert np.isfinite(arr).all()


def test_key_detection_on_synthetic(tmp_path):
    """Key detection learns a separable synthetic emotion->key mapping."""
    from video2music_tpu.cli.key_detection import run_key_detection

    rng = np.random.default_rng(0)

    class FakeDS:
        def __init__(self, n, seed):
            self.rng = np.random.default_rng(seed)
            self.samples = []
            for _ in range(n):
                key_val = float(self.rng.integers(0, 3))
                emo = self.rng.uniform(size=(20, 6)).astype(np.float32)
                emo[:, int(key_val)] += 2.0  # make classes separable
                self.samples.append({"emotion": emo,
                                     "key_val": np.asarray([key_val])})

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    from sklearn.naive_bayes import GaussianNB
    results = run_key_detection(
        FakeDS(30, 0), FakeDS(10, 1), FakeDS(10, 2),
        model_dir=str(tmp_path / "models"),
        results_path=str(tmp_path / "results.json"),
        models={"GaussianNB": GaussianNB()}, log=lambda *a: None)
    assert results["GaussianNB"]["Acc"] > 0.8
    assert os.path.exists(tmp_path / "models" / "GaussianNB.pkl")


# ---------------------------------------------------------------------
# First-party TensorBoard event writer (obs/tensorboard.py)


def _decode_tfrecords(path):
    """Independent TFRecord + protobuf decoder (no shared code with the
    writer beyond the masked-CRC reference implementation)."""
    import struct

    from video2music_tpu.obs.tensorboard import masked_crc32c

    records = []
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert len_crc == masked_crc32c(data[off:off + 8]), "length CRC"
        payload = data[off + 12:off + 12 + length]
        (crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert crc == masked_crc32c(payload), "payload CRC"
        records.append(payload)
        off += 16 + length
    assert off == len(data)
    return records


def _decode_event(buf):
    """Parse Event{wall_time=1, step=2, file_version=3, summary=5} with
    Summary{value=1{tag=1, simple_value=2}} from raw protobuf bytes."""
    import struct

    def fields(b):
        out, i = [], 0
        while i < len(b):
            key, shift = 0, 0
            while True:
                byte = b[i]; i += 1
                key |= (byte & 0x7F) << shift; shift += 7
                if not byte & 0x80:
                    break
            field, wire = key >> 3, key & 7
            if wire == 0:
                v, shift = 0, 0
                while True:
                    byte = b[i]; i += 1
                    v |= (byte & 0x7F) << shift; shift += 7
                    if not byte & 0x80:
                        break
            elif wire == 1:
                v = struct.unpack_from("<d", b, i)[0]; i += 8
            elif wire == 5:
                v = struct.unpack_from("<f", b, i)[0]; i += 4
            elif wire == 2:
                n, shift = 0, 0
                while True:
                    byte = b[i]; i += 1
                    n |= (byte & 0x7F) << shift; shift += 7
                    if not byte & 0x80:
                        break
                v = b[i:i + n]; i += n
            else:  # pragma: no cover
                raise AssertionError(f"wire type {wire}")
            out.append((field, wire, v))
        return out

    ev = {}
    for field, _, v in fields(buf):
        if field == 1:
            ev["wall_time"] = v
        elif field == 2:
            ev["step"] = v
        elif field == 3:
            ev["file_version"] = v.decode()
        elif field == 5:
            for f2, _, val in fields(v):
                assert f2 == 1
                for f3, _, x in fields(val):
                    if f3 == 1:
                        ev["tag"] = x.decode()
                    elif f3 == 2:
                        ev["value"] = x
    return ev


def test_crc32c_known_vectors():
    from video2music_tpu.obs.tensorboard import crc32c

    # RFC 3720 / public test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_summary_writer_roundtrip(tmp_path):
    from video2music_tpu.obs.tensorboard import SummaryWriter

    w = SummaryWriter(str(tmp_path / "tb"))
    w.add_scalar("Avg_CE_loss/eval", 1.25, 1)
    w.add_scalar("Avg_CE_loss/eval", 0.5, 2)
    w.add_scalar("Learn_rate/train", 3e-4, 2)
    w.close()
    assert os.path.basename(w.path).startswith("events.out.tfevents.")

    records = _decode_tfrecords(w.path)
    events = [_decode_event(r) for r in records]
    assert events[0]["file_version"] == "brain.Event:2"
    scalars = [(e["tag"], e["step"], e["value"]) for e in events[1:]]
    assert scalars[0] == ("Avg_CE_loss/eval", 1, 1.25)
    assert scalars[1] == ("Avg_CE_loss/eval", 2, 0.5)
    assert scalars[2][0] == "Learn_rate/train" and scalars[2][1] == 2
    assert abs(scalars[2][2] - 3e-4) < 1e-9
    assert all(e["wall_time"] > 1.7e9 for e in events)


def test_train_amt_writes_tensorboard(tmp_path):
    """LoopConfig.tensorboard_dir streams the reference's per-epoch tags
    (train.py:349-357) through the first-party writer."""
    from tests.test_data import _write_fixture_tree
    from video2music_tpu.core.config import TrainConfig, amt_config
    from video2music_tpu.data import create_vevo_datasets
    from video2music_tpu.models import VideoMusicTransformer
    from video2music_tpu.train.loop import LoopConfig, train_amt

    root = tmp_path / "d"
    _write_fixture_tree(str(root), ["aaa", "bbb"])
    train_ds, val_ds, _ = create_vevo_datasets(str(root), max_seq_chord=10,
                                               max_seq_video=10)
    cfg = amt_config(None, n_layers=1, num_heads=2, d_model=16, d_ff=32,
                     max_seq_video=10, max_seq_chord=10,
                     total_vf_dim=776, dropout=0.0)
    tb_dir = str(tmp_path / "tb")
    loop = LoopConfig(epochs=2, batch_size=2,
                      output_dir=str(tmp_path / "o"),
                      tensorboard_dir=tb_dir, log_fn=lambda s: None)
    train_amt(VideoMusicTransformer(cfg=cfg),
              TrainConfig(optimizer="adam", lr=1e-3), loop,
              train_ds, val_ds)
    files = os.listdir(tb_dir)
    assert len(files) == 1
    events = [_decode_event(r) for r in
              _decode_tfrecords(os.path.join(tb_dir, files[0]))]
    tags = [e.get("tag") for e in events[1:]]
    # 2 epochs x 4 reference tags, steps 1-based
    assert tags == ["Avg_CE_loss/eval", "Avg_CE_loss_chord/eval",
                    "Avg_CE_loss_emotion/eval", "Learn_rate/train"] * 2
    assert [e["step"] for e in events[1:]] == [1, 1, 1, 1, 2, 2, 2, 2]
