"""CLI contract (reference main.cpp:142-195): positional scene path,
exit -1 on load failure, film output-extension dispatch, timing lines."""
import os

import numpy as np
import pytest

from hobbyraytracer_tpu.cli.main import main

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


def test_load_failure_returns_minus_one(tmp_path, capsys):
    bad = tmp_path / "bad.yaml"
    bad.write_text("film: {width: 8}\n")  # missing required film fields
    rc = main(["render", str(bad), "--cpu"])
    assert rc == -1
    out = capsys.readouterr().out
    assert "Could not find required property" in out


def test_missing_file_returns_minus_one():
    rc = main(["render", "/nonexistent/scene.yaml", "--cpu"])
    assert rc == -1


def test_render_writes_output_by_extension(tmp_path, capsys):
    for ext in ("png", "tga", "bmp"):
        out = tmp_path / f"o.{ext}"
        rc = main(["render", os.path.join(SCENES, "cornell_box.yaml"),
                   "--cpu", "-o", str(out), "--spp", "1", "--width", "16",
                   "--height", "16", "--max-depth", "2"])
        assert rc == 1  # stb-style success code (film.cpp:59-79)
        assert out.exists() and out.stat().st_size > 0
        from hobbyraytracer_tpu.io.images import read_image
        img = read_image(str(out))
        assert img.shape == (16, 16, 3)
    text = capsys.readouterr().out
    assert "Done! (completed in " in text
    assert "Pixels rendered:" in text


def test_bare_scene_path_is_render(tmp_path):
    # `prog scene.yaml` == `prog render scene.yaml` (main.cpp:146-151)
    out = tmp_path / "bare.png"
    rc = main([os.path.join(SCENES, "cornell_box.yaml"), "--cpu", "-o",
               str(out), "--spp", "1", "--width", "8", "--height", "8",
               "--max-depth", "2"])
    assert rc == 1
    assert out.exists()


def test_multidevice_checkpoint_resume_cli(tmp_path, capsys):
    """CLI checkpoint + resume on the (virtual) multi-device path: the
    stacked per-worker checkpoint must round-trip through --resume
    (regression: int(state.retired) crashed on the (n_devices,) array)."""
    out = tmp_path / "o.png"
    ck = tmp_path / "ck.npz"
    args = ["render", os.path.join(SCENES, "cornell_box.yaml"), "--cpu",
            "-o", str(out), "--spp", "2", "--width", "16", "--height",
            "16", "--max-depth", "2", "--checkpoint", str(ck),
            "--checkpoint-every", "0"]
    rc = main(args)
    assert rc == 1 and ck.exists()
    rc = main(args + ["--resume"])
    assert rc == 1
    assert "Resumed checkpoint" in capsys.readouterr().out


def test_cli_fit_multidevice_branch(capsys):
    """cmd_fit on the 8-virtual-device conftest mesh takes the shard_map
    data-parallel branch (w*h divisible by the device count) and the
    loss matches the single-device fit's trajectory (the sharded loss is
    bitwise mesh-size-invariant)."""
    from hobbyraytracer_tpu.cli.main import main
    from hobbyraytracer_tpu.scene.fixtures import ensure_assets

    ensure_assets()
    rc = main(["fit", os.path.join(SCENES, "shiny_teapot.yaml"),
               "--steps", "3", "--spp", "1", "--max-depth", "3",
               "--width", "24", "--height", "24"])
    out = capsys.readouterr().out
    assert "8-device mesh" in out
    assert rc == 0
    import re
    losses = [float(x) for x in re.findall(r"loss (\d+\.\d+)", out)]
    assert losses and losses[-1] < losses[0]
