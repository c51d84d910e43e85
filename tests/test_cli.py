"""CLI flag surface (cli.py): reference parity (reference
src/main.cpp:57-162) plus the runtime extension flags."""

import numpy as np
import pytest

from simple_spectral_tpu.cli import build_parser, main


def parse(*argv):
    return build_parser().parse_args(list(argv))


def test_reference_flag_surface():
    a = parse("-s", "plane-srgb", "-w", "256", "-h", "128", "-spp", "32",
              "-io", "-o", "out.hdr")
    assert (a.scene, a.width, a.height, a.spp) == ("plane-srgb", 256, 128, 32)
    assert a.indirect_only and a.output == "out.hdr"


def test_reference_long_names():
    a = parse("--scene", "cornell", "--width", "64", "--height", "32",
              "--samples", "8", "--indirect-only", "--output", "x.png")
    assert (a.scene, a.width, a.height, a.spp) == ("cornell", 64, 32, 8)
    assert a.indirect_only


def test_h_is_height_not_help():
    """The reference's -h quirk (src/main.cpp:44,107): -h parses as height."""
    a = parse("-h", "96")
    assert a.height == 96


def test_runtime_extension_flags():
    a = parse("--mode", "jakob", "--observer", "2006", "--wavelengths", "8",
              "--max-depth", "6", "--no-els", "--intersect-impl", "xla2",
              "--debug-checks", "--window", "ansi", "--sp", "2", "--sharded")
    assert (a.mode, a.observer, a.wavelengths) == ("jakob", 2006, 8)
    assert a.max_depth == 6 and a.no_els and a.intersect_impl == "xla2"
    assert a.debug_checks and a.window == "ansi" and a.sp == 2 and a.sharded


def test_window_flag_default_const():
    assert parse().window is None
    assert parse("--window").window == "auto"


def test_bad_mode_rejected():
    with pytest.raises(SystemExit):
        parse("--mode", "nope")


def test_end_to_end_tiny_render(tmp_path):
    out = tmp_path / "t.png"
    rc = main(["-s", "cornell", "-w", "12", "-h", "12", "-spp", "2",
               "--mode", "rgb", "--max-depth", "3", "-o", str(out), "--quiet"])
    assert rc == 0 and out.exists()
    from PIL import Image

    im = np.asarray(Image.open(out).convert("RGB"), np.float32)
    assert im.shape == (12, 12, 3) and im.max() > 0
