from rife_tpu.video.io import VideoReader, VideoWriter, PngDirReader, PngDirWriter, transfer_audio, have_ffmpeg
from rife_tpu.video.pipeline import interpolate_video, VideoJob

__all__ = [
    "VideoReader",
    "VideoWriter",
    "PngDirReader",
    "PngDirWriter",
    "transfer_audio",
    "have_ffmpeg",
    "interpolate_video",
    "VideoJob",
]
