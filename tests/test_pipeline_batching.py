"""Batched 2X fast path == unbatched output, ordering preserved."""
import numpy as np

from rife_tpu.engine import InferenceEngine
from rife_tpu.video import VideoJob, interpolate_video
from tests.test_video_pipeline import ListReader, ListWriter, _moving_frames


def test_batched_matches_unbatched():
    engine = InferenceEngine("rife", seed=0)
    frames = _moving_frames(6)

    outs = {}
    for batch in (1, 3):
        w = ListWriter()
        stats = interpolate_video(
            engine, ListReader(frames), w, VideoJob(exp=1, batch=batch)
        )
        outs[batch] = w.frames
        assert stats["frames_out"] == len(w.frames) == 11  # 6 + 5 mids

    for a, b in zip(outs[1], outs[3]):
        np.testing.assert_array_equal(a, b)


def test_batched_with_scene_cut_ordering():
    engine = InferenceEngine("rife", seed=0)
    rng = np.random.default_rng(3)
    smooth = _moving_frames(3)
    noise = [rng.random((48, 64, 3)).astype(np.float32) for _ in range(2)]
    frames = smooth + noise  # scene cut between smooth[-1] and noise[0]
    w = ListWriter()
    stats = interpolate_video(engine, ListReader(frames), w, VideoJob(exp=1, batch=4))
    assert stats["frames_out"] == len(w.frames) == 2 * len(frames) - 1
    # source frames appear unchanged at even positions
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(
            w.frames[2 * i], (np.clip(f, 0, 1) * 255 + 0.5).astype(np.uint8)
        )
