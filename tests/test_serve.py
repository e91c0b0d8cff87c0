"""Service-layer + HTTP API tests (cv2-only environment)."""
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from rife_tpu.engine import InferenceEngine
from rife_tpu.serve import services


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine("rife", seed=0)


@pytest.fixture
def small_video(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    path = str(tmp_path / "in.mp4")
    h, w = 48, 64
    base = (rng.random((h, w + 16, 3)) * 255).astype(np.uint8)
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for i in range(4):
        wr.write(base[:, i * 4 : i * 4 + w])
    wr.release()
    return path


def test_pair_to_video(engine, tmp_path, rng):
    out = str(tmp_path / "pair.mp4")
    img0 = rng.random((40, 56, 3)).astype(np.float32)
    img1 = rng.random((40, 56, 3)).astype(np.float32)
    r = services.interpolate_pair_to_video(engine, img0, img1, out, passes=1, fps=5)
    assert r["frames"] == 3
    import os

    assert os.path.getsize(out) > 0
    from rife_tpu.video.io import have_ffmpeg
    from rife_tpu.video.mp4meta import read_colr

    if not have_ffmpeg():
        # cv2 fallback output must carry the BT.709 colr atom the ffmpeg
        # path always tags (reference image_interpolator.py:90-106)
        assert read_colr(out) == (1, 1, 1)


def test_mp4_colr_tagging(tmp_path, small_video):
    import shutil

    from rife_tpu.video.mp4meta import read_colr, tag_bt709

    p = str(tmp_path / "c.mp4")
    shutil.copy(small_video, p)
    assert read_colr(p) is None
    assert tag_bt709(p) is True
    assert read_colr(p) == (1, 1, 1)
    size = __import__("os").path.getsize(p)
    assert tag_bt709(p) is True  # idempotent
    assert __import__("os").path.getsize(p) == size
    # file stays decodable after the box surgery
    import cv2

    cap = cv2.VideoCapture(p)
    ok, fr = cap.read()
    assert ok and fr is not None


def test_disk_based_pair(engine, tmp_path, rng):
    out = str(tmp_path / "pair_disk.mp4")
    img0 = rng.random((40, 56, 3)).astype(np.float32)
    img1 = rng.random((40, 56, 3)).astype(np.float32)
    r = services.interpolate_pair_to_video(
        engine, img0, img1, out, passes=2, fps=5,
        disk_based=True, workdir=str(tmp_path / "spill"),
    )
    assert r["disk_based"] and r["frames"] == 5


def test_video_file_roundtrip(engine, tmp_path, small_video):
    out = str(tmp_path / "out.mp4")
    stats = services.interpolate_video_file(engine, small_video, out, exp=1,
                                            keep_audio=False)
    assert stats["frames_in"] == 4
    assert stats["frames_out"] == 7


def test_reencode(tmp_path, small_video):
    out = str(tmp_path / "re.mp4")
    r = services.reencode_video(small_video, out)
    assert r["action"].startswith(("reencoded", "copied"))


def test_analyzer(small_video):
    from rife_tpu.serve.analyzer import analyze_video

    a = analyze_video(small_video)
    assert a["width"] == 64 and a["height"] == 48


def test_framing_utils(small_video):
    from rife_tpu.video.framing import (
        extract_boundary_frame,
        get_video_info,
        validate_temporal_alignment,
    )

    info = get_video_info(small_video)
    assert info["frame_count"] == 4
    f = extract_boundary_frame(small_video, "first")
    assert f.shape == (48, 64, 3) and f.dtype == np.float32
    v = validate_temporal_alignment(small_video, small_video)
    assert v["compatible"]


def test_http_api(engine, tmp_path, rng):
    import cv2

    from rife_tpu.serve.app import serve_http

    up = tmp_path / "uploads"
    outd = tmp_path / "outputs"
    up.mkdir()
    outd.mkdir()
    i0 = str(up / "i0.png")
    i1 = str(up / "i1.png")
    cv2.imwrite(i0, (rng.random((40, 56, 3)) * 255).astype(np.uint8))
    cv2.imwrite(i1, (rng.random((40, 56, 3)) * 255).astype(np.uint8))

    port = 7899
    t = threading.Thread(
        target=serve_http, args=(engine, "127.0.0.1", port),
        kwargs={"upload_dir": str(up), "output_dir": str(outd)}, daemon=True)
    t.start()
    time.sleep(0.5)

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
        assert json.load(r)["status"] == "ok"

    body = json.dumps({
        "img0_path": i0, "img1_path": i1, "passes": 1,
        "out": str(outd / "api.mp4"),
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/interpolate_pair", data=body, method="POST")
    with urllib.request.urlopen(req) as r:
        assert json.load(r)["frames"] == 3

    # unknown endpoint -> 404
    req = urllib.request.Request(f"http://127.0.0.1:{port}/nope", data=b"{}", method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404

    # input outside the upload dir -> 403 (path confinement)
    body = json.dumps({
        "img0_path": "/etc/hostname", "img1_path": i1, "passes": 1,
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/interpolate_pair", data=body, method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "expected 403"
    except urllib.error.HTTPError as e:
        assert e.code == 403

    # output escaping the output dir -> 403
    body = json.dumps({
        "img0_path": i0, "img1_path": i1, "passes": 1,
        "out": str(tmp_path / "escape.mp4"),
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/interpolate_pair", data=body, method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "expected 403"
    except urllib.error.HTTPError as e:
        assert e.code == 403


def test_http_api_basic_auth(engine, tmp_path):
    import base64

    from rife_tpu.serve.app import serve_http

    port = 7898
    t = threading.Thread(
        target=serve_http, args=(engine, "127.0.0.1", port),
        kwargs={"upload_dir": str(tmp_path), "output_dir": str(tmp_path),
                "auth": ("admin", "secret")}, daemon=True)
    t.start()
    time.sleep(0.5)

    # no credentials -> 401
    try:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/health")
        assert False, "expected 401"
    except urllib.error.HTTPError as e:
        assert e.code == 401

    # wrong credentials -> 401
    req = urllib.request.Request(f"http://127.0.0.1:{port}/health")
    req.add_header("Authorization",
                   "Basic " + base64.b64encode(b"admin:wrong").decode())
    try:
        urllib.request.urlopen(req)
        assert False, "expected 401"
    except urllib.error.HTTPError as e:
        assert e.code == 401

    # correct credentials -> 200
    req = urllib.request.Request(f"http://127.0.0.1:{port}/health")
    req.add_header("Authorization",
                   "Basic " + base64.b64encode(b"admin:secret").decode())
    with urllib.request.urlopen(req) as r:
        assert json.load(r)["status"] == "ok"


def _make_clip(path, n_frames, fps, seed=0, h=48, w=64):
    import cv2

    rng = np.random.default_rng(seed)
    base = (rng.random((h, w + 4 * n_frames, 3)) * 255).astype(np.uint8)
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for i in range(n_frames):
        wr.write(base[:, i * 4 : i * 4 + w])
    wr.release()
    return path


def test_chained_transitions_cv2_fallback(engine, tmp_path):
    """Two different-fps clips -> chained output (cv2 path: in-RAM)."""
    a = _make_clip(str(tmp_path / "a.mp4"), 3, 10, seed=1)
    b = _make_clip(str(tmp_path / "b.mp4"), 3, 25, seed=2)
    out = str(tmp_path / "chain.mp4")
    r = services.chained_transitions(engine, [a, b], out, transition_passes=1)
    assert r["mode"] == "cv2"
    # 3 + 3 source frames + (2^1 - 1) transition frames
    assert r["frames"] == 7
    from rife_tpu.video import VideoReader

    assert len(list(VideoReader(out))) == 7


def test_chained_transitions_ffmpeg_plan(engine, tmp_path, monkeypatch):
    """ffmpeg segment pipeline (reference chained.py:227-313): only the
    fps-mismatched input is re-encoded, concat runs with -c copy."""
    a = _make_clip(str(tmp_path / "a.mp4"), 3, 10, seed=1)
    b = _make_clip(str(tmp_path / "b.mp4"), 3, 25, seed=2)
    out = str(tmp_path / "chain.mp4")

    calls = []

    class _R:
        returncode = 0

    def fake_run(cmd, check=False, **kw):
        calls.append([str(c) for c in cmd])
        with open(str(cmd[-1]), "wb") as f:
            f.write(b"x")
        return _R()

    monkeypatch.setattr(services, "have_ffmpeg", lambda: True)
    monkeypatch.setattr(services.subprocess, "run", fake_run)
    r = services.chained_transitions(engine, [a, b], out, transition_passes=1)
    assert r["mode"] == "concat_copy"
    assert r["fps_normalized"] == 1          # only b differs from 10 fps
    assert r["segments"] == 3                # a (untouched), transition, b
    norm = [c for c in calls if "-r" in c]
    assert len(norm) == 1 and "10.0" in norm[0][norm[0].index("-r") + 1]
    concat = [c for c in calls if "concat" in c]
    assert len(concat) == 1 and "copy" in concat[0]
    # the untouched input is referenced by its original path in the list
    assert any("a.mp4" not in " ".join(c) for c in norm)
