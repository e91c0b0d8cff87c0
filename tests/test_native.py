"""Native frame-ops: correctness vs numpy + fallback behavior."""
import numpy as np
import pytest

from rife_tpu import native


def test_u8_to_f32_pad(rng):
    frame = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
    out = native.u8_to_f32_pad(frame, 64, 64)
    assert out.shape == (64, 64, 3) and out.dtype == np.float32
    np.testing.assert_allclose(out[:37, :53], frame.astype(np.float32) / 255.0, atol=1e-7)
    assert (out[37:] == 0).all() and (out[:, 53:] == 0).all()


def test_f32_to_u8_crop(rng):
    frame = rng.standard_normal((40, 60, 3)).astype(np.float32) * 0.6 + 0.5
    out = native.f32_to_u8_crop(frame, 32, 48)
    ref = (np.clip(frame[:32, :48], 0, 1) * 255.0 + 0.5).astype(np.uint8)
    assert out.shape == (32, 48, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out, ref)


def test_native_lib_builds():
    # Informational: the env has g++, so the fast path should be live;
    # environments without a toolchain still pass via the numpy fallback.
    assert native.u8_to_f32_pad(np.zeros((8, 8, 3), np.uint8), 8, 8).sum() == 0
    print("native:", native.have_native())


def test_batched_wrappers_match_numpy(rng):
    from rife_tpu.native import f32_to_u8, u8_to_f32

    u8 = (rng.random((3, 17, 23, 3)) * 255).astype(np.uint8)
    f = u8_to_f32(u8)
    assert f.dtype == np.float32 and f.shape == u8.shape
    np.testing.assert_allclose(f, u8.astype(np.float32) / 255.0, atol=1e-7)

    f32 = rng.random((2, 9, 11, 3)).astype(np.float32) * 1.2 - 0.1
    back = f32_to_u8(f32)
    expect = (np.clip(f32, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(back, expect)
