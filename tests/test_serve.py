"""Serving tests: dynamic batching coalesces concurrent requests, and the
HTTP JSON API round-trips (no reference counterpart — the reference serves
one gradio request at a time, reference: video2music.py:1)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from video2music_tpu.pipeline import Video2music
from video2music_tpu.pipeline.serving import DynamicBatcher


@pytest.fixture(scope="module")
def tiny_v2m():
    return Video2music(
        music_gen_version="2.2", reg_model="bigru", motion_type=0,
        amt_overrides=dict(n_layers=2, num_heads=2, d_model=16, d_ff=32),
        reg_overrides=dict(n_layers=1, d_model=8, d_hidden=16))


def _feats(n_sec, seed):
    r = np.random.default_rng(seed)
    return {
        "semantic": r.standard_normal((n_sec, 768)).astype(np.float32),
        "emotion": r.uniform(size=(n_sec, 6)).astype(np.float32),
        "scene_offset": np.arange(n_sec, dtype=np.float32),
        "motion": r.standard_normal((n_sec,)).astype(np.float32),
    }


def test_dynamic_batcher_coalesces(tiny_v2m, tmp_path):
    """Concurrent submits within the wait window run as ONE bucketed
    program; every caller gets its own result in its own output dir."""
    batcher = DynamicBatcher(tiny_v2m, max_batch=8, max_wait_ms=500,
                             output_dir=str(tmp_path))
    try:
        futs = [batcher.submit(
            dict(features=_feats(12 + i, i), primer="C Am", key="C major"))
            for i in range(3)]
        out = [f.result(timeout=600) for f in futs]
        for i, (res, width) in enumerate(out):
            assert len(res.chords) == 12 + i
            assert res.chords[:2] == ["C", "A:min"]
            assert width == 4  # 3 requests padded to the 4-bucket
        dirs = {o[0].midi_path for o in out}
        assert len(dirs) == 3
        assert batcher.stats["batches"] == 1
        assert batcher.stats["max_batch_size"] == 3
    finally:
        batcher.stop()


def test_dynamic_batcher_mixes_temperatures(tiny_v2m, tmp_path):
    """Different temperatures share ONE batched program — temperature is a
    per-element traced input, not a compile-time constant (a per-value jit
    cache would be a compile-churn DoS vector at the serving boundary)."""
    n_cached = len(getattr(tiny_v2m, "_gen_cache", {}))
    batcher = DynamicBatcher(tiny_v2m, max_batch=8, max_wait_ms=500,
                             output_dir=str(tmp_path))
    try:
        f1 = batcher.submit(dict(features=_feats(10, 0), primer="C"),
                            temperature=1.0)
        f2 = batcher.submit(dict(features=_feats(10, 1), primer="C"),
                            temperature=0.5)
        (r1, w1), (r2, w2) = f1.result(600), f2.result(600)
        assert len(r1.chords) == 10 and len(r2.chords) == 10
        assert w1 == 2 and w2 == 2  # ONE width-2 program, not two splits
        assert batcher.stats["batches"] == 1
        # novel temperatures must not have minted new compiled programs
        f3 = batcher.submit(dict(features=_feats(10, 2), primer="C"),
                            temperature=0.77)
        f3.result(600)
        assert len(tiny_v2m._gen_cache) <= n_cached + 2  # per-width only
    finally:
        batcher.stop()


def test_pad_clones_skip_host_render(tiny_v2m, tmp_path):
    """Bucket-padding clones decode on-device but must NOT run the
    host-side MIDI/audio render into the shared _pad dir."""
    import os

    batcher = DynamicBatcher(tiny_v2m, max_batch=8, max_wait_ms=300,
                             output_dir=str(tmp_path))
    try:
        futs = [batcher.submit(
            dict(features=_feats(8 + i, i), primer="C"))
            for i in range(3)]  # 3 requests -> width-4 bucket, 1 pad clone
        for f in futs:
            f.result(600)
        pad_dir = os.path.join(str(tmp_path), "_pad")
        assert not os.path.exists(pad_dir) or not os.listdir(pad_dir)
    finally:
        batcher.stop()


def test_batcher_worker_survives_gather_stage_bug(tiny_v2m, tmp_path):
    """An exception OUTSIDE generate_batch (e.g. in batch assembly) must
    fail the group's futures and leave the worker alive — not kill the
    daemon thread and strand every later submit."""
    batcher = DynamicBatcher(tiny_v2m, max_batch=4, max_wait_ms=10,
                             output_dir=str(tmp_path))
    real_run_batch = batcher._run_batch
    calls = {"n": 0}

    def exploding(items):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("synthetic worker-stage bug")
        return real_run_batch(items)

    batcher._run_batch = exploding
    try:
        bad = batcher.submit(dict(features=_feats(8, 0), primer="C"))
        with pytest.raises(RuntimeError, match="synthetic"):
            bad.result(timeout=120)
        ok = batcher.submit(dict(features=_feats(8, 1), primer="C"))
        res, _ = ok.result(timeout=600)
        assert len(res.chords) == 8
        assert batcher._worker.is_alive()
    finally:
        batcher.stop()


def test_dynamic_batcher_error_propagates(tiny_v2m, tmp_path):
    batcher = DynamicBatcher(tiny_v2m, max_batch=4, max_wait_ms=10,
                             output_dir=str(tmp_path))
    try:
        fut = batcher.submit({"features": {"bogus": 1}})
        with pytest.raises(Exception):
            fut.result(timeout=120)
        # the worker survives a failed batch
        ok = batcher.submit(dict(features=_feats(8, 0), primer="C"))
        res, _ = ok.result(timeout=600)
        assert len(res.chords) == 8
    finally:
        batcher.stop()


def test_http_serve_round_trip(tiny_v2m, tmp_path):
    from video2music_tpu.cli.serve import ServeApp, make_server

    app = ServeApp(output_dir=str(tmp_path), v2m=tiny_v2m,
                   max_batch=4, max_wait_ms=20)
    server = make_server(app, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({
            "features": {k: v.tolist() for k, v in _feats(9, 3).items()},
            "primer": "Dm G", "key": "A minor", "temperature": 1.0,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as resp:
            payload = json.loads(resp.read())
        assert payload["chords"][:2] == ["D:min", "G"]
        assert len(payload["chords"]) == 9
        assert payload["batch_width"] >= 1
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["ok"] and health["stats"]["requests"] >= 1
        # unknown test_id -> 404, not a 500
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"test_id": "nope"}).encode(),
            headers={"Content-Type": "application/json"})
        app._test_ds = type("DS", (), {"ids": []})()
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 404
    finally:
        server.shutdown()
        app.stop()


def test_http_serve_bad_payload_is_400(tiny_v2m, tmp_path):
    from video2music_tpu.cli.serve import ServeApp, make_server

    app = ServeApp(output_dir=str(tmp_path), v2m=tiny_v2m)
    server = make_server(app, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"features": {"semantic": [[0.0]]}}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400  # missing feature keys != 404
    finally:
        server.shutdown()
        app.stop()


def test_batcher_buckets_cover_max_batch(tiny_v2m, tmp_path):
    b = DynamicBatcher(tiny_v2m, max_batch=24, max_wait_ms=1,
                       output_dir=str(tmp_path))
    try:
        assert b.buckets[-1] >= 24  # a 17+-request group has a width
    finally:
        b.stop()


def test_streaming_on_decoded_fires_before_render(tiny_v2m, tmp_path):
    """on_decoded delivers the chords before the future resolves with the
    fully rendered result, and both agree."""
    events = []
    batcher = DynamicBatcher(tiny_v2m, max_batch=4, max_wait_ms=10,
                             output_dir=str(tmp_path))
    try:
        fut = batcher.submit({"features": _feats(6, 0), "primer": "C"},
                             on_decoded=lambda p: events.append(p))
        result, _ = fut.result(timeout=120)
        assert len(events) == 1
        assert events[0]["chords"] == result.chords
        assert events[0]["key"] == result.key
    finally:
        batcher.stop()


def test_backpressure_sheds_load(tiny_v2m, tmp_path):
    """A full bounded queue raises Overloaded instead of queueing forever;
    accepted requests still complete."""
    from video2music_tpu.pipeline.serving import Overloaded

    batcher = DynamicBatcher(tiny_v2m, max_batch=2, max_wait_ms=1,
                             max_queue=2, output_dir=str(tmp_path))
    try:
        futs = []
        shed = 0
        # the worker drains slowly relative to this burst; some submits
        # must shed once 2 are queued (worker may have taken a couple)
        for i in range(40):
            try:
                futs.append(batcher.submit(
                    {"features": _feats(4, i), "primer": "C"}))
            except Overloaded:
                shed += 1
        assert shed > 0
        assert batcher.stats["shed"] == shed
        for f in futs:
            f.result(timeout=300)
    finally:
        batcher.stop()


def test_submit_control_hot_reload_runs_on_worker(tiny_v2m, tmp_path):
    """submit_control executes between batches on the worker thread and
    returns its value; a control fn error surfaces in the Future."""
    batcher = DynamicBatcher(tiny_v2m, max_batch=2, max_wait_ms=5,
                             output_dir=str(tmp_path))
    try:
        seen = {}

        def ctl(v2m):
            seen["thread"] = threading.current_thread().name
            seen["v2m"] = v2m
            return "done"

        fut = batcher.submit(
            {"features": _feats(4, 0), "primer": "C"})
        cfut = batcher.submit_control(ctl)
        assert cfut.result(timeout=120) == "done"
        assert seen["v2m"] is tiny_v2m
        assert seen["thread"] == "v2m-batcher"
        fut.result(timeout=120)

        boom = batcher.submit_control(
            lambda v2m: (_ for _ in ()).throw(RuntimeError("bad ckpt")))
        with pytest.raises(RuntimeError, match="bad ckpt"):
            boom.result(timeout=120)
        # the worker survives a failed control op
        ok = batcher.submit({"features": _feats(4, 1), "primer": "C"})
        ok.result(timeout=120)
    finally:
        batcher.stop()


def _stall_worker(batcher):
    """Block the batcher worker inside a control op until the returned
    event is set — lets a test enqueue requests while nothing drains."""
    gate = threading.Event()
    entered = threading.Event()

    def ctl(_v2m):
        entered.set()
        gate.wait(timeout=60)

    batcher.submit_control(ctl)
    assert entered.wait(timeout=60)
    return gate


def test_priority_requests_gather_first(tiny_v2m, tmp_path):
    """With the worker stalled, queued requests drain in priority order
    (FIFO within a class) — the high-priority latecomer decodes in the
    first batch."""
    batcher = DynamicBatcher(tiny_v2m, max_batch=1, max_wait_ms=1,
                             output_dir=str(tmp_path))
    order = []
    real = batcher._run_batch

    def spying(items):
        order.extend(it.priority for it in items)
        return real(items)

    batcher._run_batch = spying
    try:
        gate = _stall_worker(batcher)
        futs = [batcher.submit(dict(features=_feats(4, 0), primer="C"),
                               priority=0),
                batcher.submit(dict(features=_feats(4, 1), primer="C"),
                               priority=5),
                batcher.submit(dict(features=_feats(4, 2), primer="C"),
                               priority=0)]
        gate.set()
        for f in futs:
            f.result(timeout=300)
        assert order == [5, 0, 0]
    finally:
        batcher.stop()


def test_deadline_expires_before_decode(tiny_v2m, tmp_path):
    """A request whose deadline_s elapses while queued fails fast with
    DeadlineExceeded (never occupying a decode slot); requests without a
    deadline are unaffected and the worker keeps serving."""
    from video2music_tpu.pipeline.serving import DeadlineExceeded

    batcher = DynamicBatcher(tiny_v2m, max_batch=4, max_wait_ms=1,
                             output_dir=str(tmp_path))
    try:
        gate = _stall_worker(batcher)
        doomed = batcher.submit(dict(features=_feats(4, 0), primer="C"),
                                deadline_s=0.05)
        ok = batcher.submit(dict(features=_feats(4, 1), primer="C"))
        import time as _t
        _t.sleep(0.2)
        gate.set()
        with pytest.raises(DeadlineExceeded):
            doomed.result(timeout=300)
        res, _ = ok.result(timeout=300)
        assert len(res.chords) == 4
        assert batcher.stats["expired"] == 1
    finally:
        batcher.stop()


def test_deadline_validation_and_future_deadline_passes(tiny_v2m, tmp_path):
    batcher = DynamicBatcher(tiny_v2m, max_batch=2, max_wait_ms=1,
                             output_dir=str(tmp_path))
    try:
        with pytest.raises(ValueError, match="deadline_s"):
            batcher.submit(dict(features=_feats(4, 0)), deadline_s=0)
        # a generous deadline does not interfere
        fut = batcher.submit(dict(features=_feats(4, 0), primer="C"),
                             deadline_s=600)
        res, _ = fut.result(timeout=300)
        assert len(res.chords) == 4
    finally:
        batcher.stop()


def test_http_deadline_maps_to_504(tiny_v2m, tmp_path):
    from video2music_tpu.cli.serve import ServeApp, make_server

    app = ServeApp(output_dir=str(tmp_path), v2m=tiny_v2m,
                   max_batch=2, max_wait_ms=1)
    server = make_server(app, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        gate = _stall_worker(app.batcher)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({
                "features": {k: v.tolist()
                             for k, v in _feats(4, 0).items()},
                "primer": "C", "deadline_s": 0.05}).encode(),
            headers={"Content-Type": "application/json"})
        codes = []

        def call():
            try:
                urllib.request.urlopen(req, timeout=120)
                codes.append(200)
            except urllib.error.HTTPError as exc:
                codes.append(exc.code)

        t = threading.Thread(target=call)
        t.start()
        import time as _t
        _t.sleep(0.3)   # let deadline_s=0.05 elapse while queued
        gate.set()      # worker pops the request -> expired -> 504
        t.join(timeout=120)
        assert codes == [504]
    finally:
        server.shutdown()
        app.stop()


def test_submit_requires_features_or_video(tiny_v2m, tmp_path):
    batcher = DynamicBatcher(tiny_v2m, max_batch=2, max_wait_ms=1,
                             output_dir=str(tmp_path))
    try:
        with pytest.raises(ValueError, match="features.*video"):
            batcher.submit({"primer": "C"})
    finally:
        batcher.stop()


@pytest.fixture(scope="module")
def extracting_v2m():
    """Tiny CLIP-only Video2music (motion_type=0: scalar motion, no
    MaxViT) whose generate() consumes its own extracted features."""
    import jax
    import jax.numpy as jnp

    from video2music_tpu.features.clip import (CLIP, CLIPConfig,
                                               CLIPVisionConfig)

    ccfg = CLIPConfig(vision=CLIPVisionConfig(
        hidden_size=16, layers=1, heads=2, patch_size=14, image_size=56,
        projection_dim=768))
    rng = jax.random.PRNGKey(0)
    text = np.asarray(jax.random.normal(jax.random.fold_in(rng, 1),
                                        (6, 768)), np.float32)
    clip_model = CLIP(cfg=ccfg)
    clip_params = clip_model.init(
        rng, jnp.zeros((1, 56, 56, 3)), jnp.asarray(text),
        method=CLIP.semantic_and_emotion)["params"]
    return Video2music(
        music_gen_version="2.2", reg_model="bigru", motion_type=0,
        amt_overrides=dict(n_layers=1, num_heads=2, d_model=16, d_ff=32),
        reg_overrides=dict(n_layers=1, d_model=8, d_hidden=16),
        clip_params=clip_params, emotion_text_embeds=text,
        clip_cfg=ccfg, extractor_dtype="float32")


def _write_video(path, seconds=4, fps=5.0, w=64, h=48, seed=0):
    cv2 = pytest.importorskip("cv2")
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        pytest.skip("cv2.VideoWriter cannot encode here")
    r = np.random.default_rng(seed)
    color = r.integers(0, 255, 3)
    for i in range(int(seconds * fps)):
        img = np.empty((h, w, 3), np.uint8)
        img[:] = color
        img[:, : (i * 5) % w] //= 2
        writer.write(img)
    writer.release()


def test_video_requests_batch_through_shared_extraction(extracting_v2m,
                                                        tmp_path):
    """Requests carrying raw videos get group-extracted (shared CLIP
    programs) then group-decoded; results match a direct generate() on
    the same clip's extracted features."""
    v1 = tmp_path / "a.mp4"
    v2 = tmp_path / "b.mp4"
    _write_video(v1, seconds=4, seed=1)
    _write_video(v2, seconds=6, seed=2)

    batcher = DynamicBatcher(extracting_v2m, max_batch=4, max_wait_ms=300,
                             output_dir=str(tmp_path))
    try:
        f1 = batcher.submit({"video": str(v1), "primer": "C"})
        f2 = batcher.submit({"video": str(v2), "primer": "Am"})
        (r1, w1), (r2, w2) = f1.result(timeout=300), f2.result(timeout=300)
        assert w1 == w2 == 2  # one shared program for both
        assert len(r1.chords) == 4 and len(r2.chords) == 6
        # oracle: same clip through single-path extraction + generate
        feats = extracting_v2m.extract_features(str(v1))
        direct = extracting_v2m.generate(
            primer="C", features=feats,
            output_dir=str(tmp_path / "direct"), temperature=1.0)
        assert direct.chords == r1.chords
    finally:
        batcher.stop()


def test_http_stream_and_reload(extracting_v2m, tmp_path):
    """stream:true yields a 'decoded' NDJSON line then 'done'; /reload
    without args is a 400; /generate with a video path works."""
    from video2music_tpu.cli.serve import ServeApp, make_server

    vid = tmp_path / "s.mp4"
    _write_video(vid, seconds=3, seed=3)
    app = ServeApp(output_dir=str(tmp_path), v2m=extracting_v2m)
    server = make_server(app, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"video": str(vid), "primer": "C",
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            lines = [json.loads(l) for l in resp.read().splitlines() if l]
        assert [l["stage"] for l in lines] == ["decoded", "done"]
        assert lines[0]["chords"] == lines[1]["chords"]
        assert len(lines[0]["chords"]) == 3

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload", data=b"{}",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        app.stop()


# ---------------------------------------------------------------------------
# decode/render pipelining: host MIDI renders overlap the NEXT batch's decode
# ---------------------------------------------------------------------------

class _GatedV2M:
    """Proxy over a Video2music that gates the render closure of selected
    batches behind a threading.Event, to observe the decode/render overlap
    deterministically."""

    def __init__(self, v2m):
        self._v2m = v2m
        self.gate = threading.Event()
        self.decodes = 0          # generate_batch returns (decode fetched)
        self.renders_done = 0
        self.fail_render = False
        self._lock = threading.Lock()

    def __getattr__(self, name):
        return getattr(self._v2m, name)

    def generate_batch(self, *args, **kwargs):
        assert kwargs.get("defer_render"), "batcher must defer renders"
        render = self._v2m.generate_batch(*args, **kwargs)
        with self._lock:
            self.decodes += 1

        def gated():
            self.gate.wait(timeout=120)
            if self.fail_render:
                raise RuntimeError("synthetic render bug")
            out = render()
            with self._lock:
                self.renders_done += 1
            return out

        return gated


def test_render_pipelines_behind_decode(tiny_v2m, tmp_path):
    """While batch 1's host render is still running, the worker must have
    already decoded batch 2 (the render thread, not the worker, runs
    renders) — and a blocked render must not block streaming callbacks,
    which fire at decode-fetch time."""
    import time

    proxy = _GatedV2M(tiny_v2m)
    batcher = DynamicBatcher(proxy, max_batch=2, max_wait_ms=10,
                             output_dir=str(tmp_path))
    try:
        streamed = []
        f1 = batcher.submit(dict(features=_feats(8, 0), primer="C"),
                            on_decoded=streamed.append)
        deadline = time.monotonic() + 300
        while proxy.decodes < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert proxy.decodes == 1 and not f1.done()
        assert len(streamed) == 1  # on_decoded fired before the render
        # batch 1's render is gated; batch 2 must still decode
        f2 = batcher.submit(dict(features=_feats(8, 1), primer="C"))
        while proxy.decodes < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert proxy.decodes == 2, "decode 2 must not wait on render 1"
        assert not f1.done() and not f2.done()
        proxy.gate.set()
        (r1, _), (r2, _) = f1.result(120), f2.result(120)
        assert len(r1.chords) == 8 and len(r2.chords) == 8
        assert proxy.renders_done == 2
    finally:
        proxy.gate.set()
        batcher.stop()


def test_control_drains_inflight_renders(tiny_v2m, tmp_path):
    """submit_control promises between-batches semantics: it must not run
    until every dispatched batch's render has resolved."""
    import time

    proxy = _GatedV2M(tiny_v2m)
    batcher = DynamicBatcher(proxy, max_batch=2, max_wait_ms=10,
                             output_dir=str(tmp_path))
    try:
        f1 = batcher.submit(dict(features=_feats(8, 0), primer="C"))
        deadline = time.monotonic() + 300
        while proxy.decodes < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        ctl = batcher.submit_control(lambda v2m: proxy.renders_done)
        time.sleep(0.2)
        assert not ctl.done(), "control ran while a render was in flight"
        proxy.gate.set()
        assert ctl.result(timeout=120) == 1  # render finished first
        f1.result(timeout=120)
    finally:
        proxy.gate.set()
        batcher.stop()


def test_render_error_fails_only_its_batch(tiny_v2m, tmp_path):
    """A render-stage exception fails that batch's futures; the render
    thread and worker keep serving later batches."""
    proxy = _GatedV2M(tiny_v2m)
    proxy.gate.set()
    proxy.fail_render = True
    batcher = DynamicBatcher(proxy, max_batch=2, max_wait_ms=10,
                             output_dir=str(tmp_path))
    try:
        bad = batcher.submit(dict(features=_feats(8, 0), primer="C"))
        with pytest.raises(RuntimeError, match="synthetic render bug"):
            bad.result(timeout=300)
        proxy.fail_render = False
        ok = batcher.submit(dict(features=_feats(8, 1), primer="C"))
        res, _ = ok.result(timeout=300)
        assert len(res.chords) == 8
        assert batcher._worker.is_alive() and batcher._renderer.is_alive()
    finally:
        batcher.stop()


def test_cancelled_future_does_not_kill_render_thread(tiny_v2m, tmp_path):
    """A caller cancelling its future (e.g. after a result timeout) must
    not crash the render thread: these futures are never set_running, so
    cancel() succeeds and an unguarded set_result would raise
    InvalidStateError, killing the renderer and wedging the worker."""
    proxy = _GatedV2M(tiny_v2m)
    batcher = DynamicBatcher(proxy, max_batch=2, max_wait_ms=10,
                             output_dir=str(tmp_path))
    try:
        f1 = batcher.submit(dict(features=_feats(8, 0), primer="C"))
        assert f1.cancel()  # before the render resolves it
        proxy.gate.set()
        ok = batcher.submit(dict(features=_feats(8, 1), primer="C"))
        res, _ = ok.result(timeout=300)
        assert len(res.chords) == 8
        assert batcher._renderer.is_alive() and batcher._worker.is_alive()
    finally:
        proxy.gate.set()
        batcher.stop()


def test_stop_waits_for_inflight_decode(tiny_v2m, tmp_path):
    """stop() must join the worker until it actually exits (decodes/cold
    compiles can exceed any fixed timeout): a stop sentinel reaching the
    render queue BEFORE the worker's final batch would let the renderer
    exit early and strand that batch's futures forever."""
    import time

    proxy = _GatedV2M(tiny_v2m)
    # block the worker's NEXT render hand-off: render_q holds batch 1,
    # renderer blocks on the gate -> the worker's put for batch 2 blocks
    batcher = DynamicBatcher(proxy, max_batch=1, max_wait_ms=10,
                             output_dir=str(tmp_path))
    try:
        f1 = batcher.submit(dict(features=_feats(8, 0), primer="C"))
        f2 = batcher.submit(dict(features=_feats(8, 1), primer="C"))
        deadline = time.monotonic() + 300
        while proxy.decodes < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
        stopper = threading.Thread(target=batcher.stop)
        stopper.start()
        time.sleep(0.3)
        # worker is still handing off batch 2; stop() must still be waiting
        assert stopper.is_alive()
        proxy.gate.set()
        stopper.join(timeout=300)
        assert not stopper.is_alive()
        (r1, _), (r2, _) = f1.result(timeout=10), f2.result(timeout=10)
        assert len(r1.chords) == 8 and len(r2.chords) == 8
    finally:
        proxy.gate.set()


def test_generate_batch_empty_defer_render_returns_closure(tiny_v2m):
    """generate_batch([], defer_render=True) must honour the contract and
    return a zero-arg closure (callers invoke it unconditionally)."""
    render = tiny_v2m.generate_batch([], defer_render=True)
    assert callable(render) and render() == []
    assert tiny_v2m.generate_batch([]) == []
