"""Native C++ framebuffer runtime vs the numpy reference path."""

import numpy as np
import pytest

from simple_spectral_tpu.utils.native_fb import NativeFramebuffer, load_native

pytestmark = pytest.mark.skipif(load_native() is None, reason="no C++ compiler")


def test_accumulate_and_mean(rng):
    fb = NativeFramebuffer(16, 8)
    n = 16 * 8
    total_v = np.zeros((n, 3))
    total_a = np.zeros(n)
    for p in range(3):
        v = rng.random((n, 3)).astype(np.float32)
        a = rng.random(n).astype(np.float32)
        fb.add_chunk(0, v, a)
        fb.note_pass(2)
        total_v += v
        total_a += a
    value, alpha = fb.mean()
    assert fb.spp_done == 6
    assert np.allclose(value.reshape(n, 3), total_v / 6, atol=1e-6)
    assert np.allclose(alpha.reshape(n), total_a / 6, atol=1e-6)


def test_partial_chunks(rng):
    fb = NativeFramebuffer(8, 8)
    v = rng.random((20, 3)).astype(np.float32)
    a = np.ones(20, np.float32)
    fb.add_chunk(10, v, a)
    fb.note_pass(1)
    value, alpha = fb.mean()
    flat_v = value.reshape(-1, 3)
    assert np.allclose(flat_v[10:30], v, atol=1e-6)
    assert np.allclose(flat_v[:10], 0.0)
    assert np.allclose(alpha.reshape(-1)[10:30], 1.0)


def test_tonemap_matches_numpy(rng):
    from simple_spectral_tpu.spectra.colorimetry import lrgb_to_srgb_np

    fb = NativeFramebuffer(32, 16)
    n = 32 * 16
    v = (rng.random((n, 3)) * 1.5).astype(np.float32)
    a = rng.random(n).astype(np.float32)
    fb.add_chunk(0, v, a)
    fb.note_pass(1)
    m = rng.normal(size=(3, 3)).astype(np.float32) * 0.3 + np.eye(3, dtype=np.float32)
    got = fb.tonemap_srgb_u8(m, flip_rows=True)

    mean = v.reshape(16, 32, 3)
    lrgb = np.einsum("ij,hwj->hwi", m.astype(np.float64), mean)
    srgb = lrgb_to_srgb_np(lrgb)
    rgba = np.concatenate([srgb, a.reshape(16, 32, 1)], axis=-1)
    want = np.clip(rgba * 255.0 + 0.5, 0, 255).astype(np.uint8)[::-1]
    # f32-vs-f64 gamma rounding can flip a u8 by 1 at bucket boundaries
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_checkpoint_roundtrip(tmp_path, rng):
    fb = NativeFramebuffer(8, 8)
    v = rng.random((64, 3)).astype(np.float32)
    a = rng.random(64).astype(np.float32)
    fb.add_chunk(0, v, a)
    fb.note_pass(4)
    p = str(tmp_path / "fb.ckpt")
    assert fb.checkpoint_async(p)
    assert fb.checkpoint_wait()

    fb2 = NativeFramebuffer(8, 8)
    assert fb2.checkpoint_load(p)
    assert fb2.spp_done == 4
    v1, a1 = fb.mean()
    v2, a2 = fb2.mean()
    assert np.array_equal(v1, v2) and np.array_equal(a1, a2)

    # dimension mismatch is rejected
    fb3 = NativeFramebuffer(4, 4)
    assert not fb3.checkpoint_load(p)


def test_checkpoint_missing_file():
    fb = NativeFramebuffer(4, 4)
    assert not fb.checkpoint_load("/nonexistent/path.ckpt")
