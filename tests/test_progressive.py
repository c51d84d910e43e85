"""Progressive rendering + checkpoint/resume invariants."""

import numpy as np
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.progressive import ProgressiveRenderer
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(scene="cornell", mode="rgb", width=8, height=8, spp=8, max_depth=3)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    return cfg, scene, tables


def test_resume_is_bitwise_identical(setup, tmp_path):
    cfg, scene, tables = setup
    ckpt = str(tmp_path / "r.ckpt.npz")

    # uninterrupted render
    a = ProgressiveRenderer(cfg, scene, tables, seed=9, spp_per_pass=2)
    a.run()
    va, _ = a.mean_value()

    # interrupted after 2 passes, then resumed by a fresh renderer
    b1 = ProgressiveRenderer(cfg, scene, tables, seed=9, checkpoint_path=ckpt, spp_per_pass=2)
    b1.run_pass()
    b1.run_pass()
    b1.save_checkpoint()

    b2 = ProgressiveRenderer(cfg, scene, tables, seed=9, checkpoint_path=ckpt, spp_per_pass=2)
    assert b2.resume()
    assert b2.spp_done == 4
    b2.run()
    vb, _ = b2.mean_value()
    assert np.array_equal(va, vb), np.abs(va - vb).max()


def test_resume_rejects_mismatched_config(setup, tmp_path):
    cfg, scene, tables = setup
    ckpt = str(tmp_path / "r.ckpt.npz")
    a = ProgressiveRenderer(cfg, scene, tables, seed=1, checkpoint_path=ckpt)
    a.run_pass()
    a.save_checkpoint()

    cfg2 = cfg.replace(spp=16)
    b = ProgressiveRenderer(cfg2, scene, tables, seed=1, checkpoint_path=ckpt)
    with pytest.raises(ValueError):
        b.resume()
    c = ProgressiveRenderer(cfg, scene, tables, seed=2, checkpoint_path=ckpt)
    with pytest.raises(ValueError):
        c.resume()


def test_metrics_populated(setup):
    cfg, scene, tables = setup
    a = ProgressiveRenderer(cfg, scene, tables, seed=0, spp_per_pass=4)
    a.run()
    d = a.metrics.to_dict()
    assert d["spp"] == cfg.spp
    assert d["rays_traced"] == 8 * 8 * 8 * (2 * 3 - 1)
    assert d["mrays_per_s"] > 0
    assert d["n_passes"] == 2


def test_native_and_numpy_backends_agree(setup):
    cfg, scene, tables = setup
    from simple_spectral_tpu.utils.native_fb import load_native

    if load_native() is None:
        pytest.skip("no C++ compiler")
    a = ProgressiveRenderer(cfg, scene, tables, seed=3, native=True)
    b = ProgressiveRenderer(cfg, scene, tables, seed=3, native=False)
    assert a.native and not b.native
    a.run()
    b.run()
    va, aa = a.mean_value()
    vb, ab = b.mean_value()
    assert np.array_equal(va, vb) and np.array_equal(aa, ab)
    # the native u8 tonemap agrees with the python finalize within 1 LSB
    ua = a.image_u8()
    fb = b.image()[::-1]
    ub = np.clip(np.round(fb * 255.0), 0, 255).astype(np.uint8)
    assert np.abs(ua.astype(int) - ub.astype(int)).max() <= 1


def test_sharded_progressive_resume_bitwise(setup, tmp_path):
    """Progressive rendering on a dp x sp mesh: interrupted + resumed equals
    uninterrupted bitwise (same mesh => same per-shard streams), and the
    checkpoint refuses a different mesh factorization."""
    from simple_spectral_tpu.parallel.sharding import make_mesh

    cfg, scene, tables = setup
    mesh = make_mesh(sp=2)
    ckpt = str(tmp_path / "s.ckpt.npz")

    a = ProgressiveRenderer(cfg, scene, tables, seed=9, spp_per_pass=2, mesh=mesh)
    a.run()
    va, aa = a.mean_value()
    assert a.spp_done == cfg.spp and np.isfinite(va).all()

    b1 = ProgressiveRenderer(cfg, scene, tables, seed=9, checkpoint_path=ckpt,
                             spp_per_pass=2, mesh=mesh)
    b1.run_pass()
    b1.save_checkpoint()
    b2 = ProgressiveRenderer(cfg, scene, tables, seed=9, checkpoint_path=ckpt,
                             spp_per_pass=2, mesh=mesh)
    assert b2.resume() and b2.spp_done == 2
    b2.run()
    vb, _ = b2.mean_value()
    assert np.array_equal(va, vb), np.abs(va - vb).max()

    other = ProgressiveRenderer(cfg, scene, tables, seed=9, checkpoint_path=ckpt,
                                spp_per_pass=2, mesh=make_mesh(sp=1))
    with pytest.raises(ValueError, match="different RenderConfig"):
        other.resume()


def test_sharded_progressive_estimate_sane(setup):
    """The mesh estimate must converge to the single-device estimate (same
    scene, independent streams): means agree to MC tolerance."""
    from simple_spectral_tpu.parallel.sharding import make_mesh

    cfg, scene, tables = setup
    cfg = cfg.replace(spp=64)
    a = ProgressiveRenderer(cfg, scene, tables, seed=3, spp_per_pass=16)
    a.run()
    va, aa = a.mean_value()
    b = ProgressiveRenderer(cfg, scene, tables, seed=3, spp_per_pass=16,
                            mesh=make_mesh(sp=2))
    b.run()
    vb, ab = b.mean_value()
    # alpha is camera-hit probability: deterministic-ish per pixel
    np.testing.assert_allclose(aa, ab, atol=0.35)
    scale = max(va.mean(), 1e-6)
    assert np.abs(va.mean(axis=(0, 1)) - vb.mean(axis=(0, 1))).max() / scale < 0.1
