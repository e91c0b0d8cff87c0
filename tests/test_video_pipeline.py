"""Video pipeline integration tests on synthetic frames (no datasets)."""
import numpy as np
import pytest

from rife_tpu.engine import InferenceEngine
from rife_tpu.video import VideoJob, interpolate_video
from rife_tpu.video.yuv import YUV420Reader, YUV420Writer, rgb_to_yuv, yuv_to_rgb


class ListReader:
    def __init__(self, frames, fps=10.0):
        self.frames = frames
        self.fps = fps
        self.width = frames[0].shape[1]
        self.height = frames[0].shape[0]
        self.frame_count = len(frames)

    def __iter__(self):
        return iter(self.frames)


class ListWriter:
    def __init__(self):
        self.frames = []

    def write(self, f):
        self.frames.append(f)

    def close(self):
        pass


def _moving_frames(n=5, h=48, w=64, shift=3):
    rng = np.random.default_rng(0)
    base = rng.random((h, w + n * shift, 3)).astype(np.float32)
    # slight blur for realism
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3
    return [np.ascontiguousarray(base[:, i * shift : i * shift + w]) for i in range(n)]


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine("rife", seed=0)


def test_2x_interpolation_counts(engine):
    frames = _moving_frames(4)
    writer = ListWriter()
    stats = interpolate_video(engine, ListReader(frames), writer, VideoJob(exp=1))
    # 4 source frames -> 3 gaps -> 4 + 3 = 7 outputs
    assert stats["frames_in"] == 4
    assert len(writer.frames) == 7
    assert all(f.dtype == np.uint8 for f in writer.frames)
    # endpoints preserved
    np.testing.assert_array_equal(
        writer.frames[0], (np.clip(frames[0], 0, 1) * 255 + 0.5).astype(np.uint8)
    )


def test_scene_cut_gate(engine):
    rng = np.random.default_rng(1)
    a = np.zeros((48, 64, 3), np.float32)
    b = rng.random((48, 64, 3)).astype(np.float32)  # totally different -> ssim < 0.2
    writer = ListWriter()
    stats = interpolate_video(engine, ListReader([a, b]), writer, VideoJob(exp=1))
    assert stats["scene_cut"] == 1
    # the inserted frame is a copy of I0, not an interpolation
    np.testing.assert_array_equal(writer.frames[1], writer.frames[0])


def test_static_gate_preserves_frame_count(engine):
    # N static frames at 2X must yield 2N-1 outputs, same as a normal
    # clip (reference temp/break_flag contract, inference_video.py:231-274).
    # Round-1 regression: the read-ahead frame was dropped (3 outputs for
    # N=3 instead of 5).
    frames = _moving_frames(3, shift=0)  # identical frames -> ssim > 0.996
    writer = ListWriter()
    stats = interpolate_video(engine, ListReader(frames), writer, VideoJob(exp=1))
    assert stats["static"] >= 1
    assert stats["frames_in"] == 3
    assert len(writer.frames) == 5


def test_static_final_pair_terminates(engine):
    # Round-1 regression: a clip whose LAST pair is static consumed the
    # reader's None sentinel in the read-ahead and deadlocked forever.
    frames = _moving_frames(2, shift=0)
    writer = ListWriter()
    stats = interpolate_video(engine, ListReader(frames), writer, VideoJob(exp=1))
    assert stats["static"] == 1
    assert len(writer.frames) == 3  # src, mid, synthesized final


def test_static_gate_synthesizes_replacement(engine):
    # The duplicate frame is REPLACED in the output stream by
    # inference(I0, next) (reference inference_video.py:231-243) — with a
    # static first pair then motion, output[2] must NOT equal the
    # duplicate input frame.
    moving = _moving_frames(2, shift=8)
    frames = [moving[0], moving[0].copy(), moving[1]]
    writer = ListWriter()
    stats = interpolate_video(engine, ListReader(frames), writer, VideoJob(exp=1))
    assert stats["static"] == 1
    assert len(writer.frames) == 5
    dup_u8 = (np.clip(frames[1], 0, 1) * 255 + 0.5).astype(np.uint8)
    assert not np.array_equal(writer.frames[2], dup_u8)


def test_montage(engine):
    frames = _moving_frames(2)
    writer = ListWriter()
    interpolate_video(engine, ListReader(frames), writer, VideoJob(exp=1, montage=True))
    # Reference montages the CENTER HALF of the source beside the output
    # (inference_video.py:196-205): total width == w//2 * 2.
    assert writer.frames[0].shape[1] == (frames[0].shape[1] // 2) * 2


def test_yuv420_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    path = str(tmp_path / "clip.yuv")
    h, w = 32, 64
    frames = [rng.random((h, w, 3)).astype(np.float32) for _ in range(3)]
    wr = YUV420Writer(path, w, h)
    for f in frames:
        wr.write_frame(f)
    wr.close()
    rd = YUV420Reader(path, w, h)
    f1 = rd.read_frame(1)
    assert f1.shape == (h, w, 3)
    # luma survives the 4:2:0 roundtrip closely
    assert np.abs(f1[..., 0] - frames[1][..., 0]).mean() < 0.01
    # random access beyond the end returns None
    assert rd.read_frame(5) is None
    rgb = rd.read_rgb(0)
    assert rgb.dtype == np.uint8 and rgb.shape == (h, w, 3)


def test_yuv_rgb_matrices():
    rng = np.random.default_rng(3)
    x = rng.random((8, 8, 3)).astype(np.float32)
    back = yuv_to_rgb(rgb_to_yuv(x))
    np.testing.assert_allclose(back, x, atol=1e-4)
