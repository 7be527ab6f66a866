"""CLI subcommands and the profiling/report path (reference Demo.cpp's
exit-time stats table + the GaussianRender CLI surface)."""

import numpy as np
import pytest

from cudagaussianrenderer_tpu.cli import main
from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import Camera
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.render import Renderer, STAGE_NAMES

PIL = pytest.importorskip("PIL.Image")


def test_cli_render_writes_png(tmp_path):
    out = tmp_path / "out.png"
    main(["render", "--procedural", "300", "--size", "64", "-o", str(out)])
    img = np.asarray(PIL.open(out))
    assert img.shape == (64, 64, 4)
    assert img[..., 3].max() == 255


@pytest.mark.slow
def test_cli_orbit_writes_frames(tmp_path):
    out = tmp_path / "frames"
    main(["orbit", "--procedural", "200", "--size", "64", "-o", str(out), "-n", "2"])
    frames = sorted(out.glob("frame_*.png"))
    assert len(frames) == 2


@pytest.mark.slow
def test_profile_frame_and_report():
    scene = random_scene(300, seed=4)
    r = Renderer(scene, RenderConfig(screen_size=64, tiles_per_cell=4))
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    stages = r.profile_frame(cam, warmup=True)
    # All reference stage names except SH (scene has none) are timed.
    expected = set(STAGE_NAMES) - {"evaluateSphericalHarmonics"}
    assert expected <= set(stages)
    assert all(ms >= 0.0 for ms in stages.values())
    assert r.profiled_count == 1
    report = r.report()
    for name in expected:
        assert name in report
    assert "Total average time ms" in report


@pytest.mark.slow
def test_cli_interactive_replay_is_deterministic(tmp_path):
    """The interactive loop (headless GLFW-loop analog, Demo.cpp:352-528)
    replays an input script deterministically: two runs produce identical
    frames, and the drag/orbit events actually move the camera."""
    script = tmp_path / "script.jsonl"
    script.write_text(
        "\n".join(
            [
                '{"frames": 1, "buttons": "none", "pointer": [32, 32]}',
                '{"frames": 2, "buttons": "left", "pointer": [44, 32]}',
                '{"frames": 2, "buttons": "middle", "pointer": [44, 40]}',
                '{"frames": 1, "buttons": "none", "pointer": [44, 40], "move": [0, 0, -1]}',
            ]
        )
    )
    outs = []
    for run in ("a", "b"):
        out = tmp_path / run
        main(
            [
                "interactive", "--procedural", "200", "--size", "64",
                "--script", str(script), "-o", str(out),
            ]
        )
        frames = sorted(out.glob("frame_*.png"))
        assert len(frames) == 6
        outs.append([np.asarray(PIL.open(f)) for f in frames])
    for fa, fb in zip(*outs):
        np.testing.assert_array_equal(fa, fb)
    # The camera moved: first and last frames differ.
    assert (outs[0][0] != outs[0][-1]).any()


def test_cli_compare_metrics(tmp_path, capsys):
    import json

    from cudagaussianrenderer_tpu.utils.png import write_png

    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    b = a.copy()
    b[0, 0, 0] ^= 4
    pa, pb = tmp_path / "a.png", tmp_path / "b.png"
    write_png(pa, a)
    write_png(pb, b)

    main(["compare", str(pa), str(pa)])
    out = json.loads(capsys.readouterr().out)
    assert out["max_delta"] == 0 and out["ssim"] == 1.0

    main(["compare", str(pa), str(pb)])
    out = json.loads(capsys.readouterr().out)
    assert out["max_delta"] == 4 and out["psnr_db"] > 40

    with pytest.raises(SystemExit, match="exceeds"):
        main(["compare", str(pa), str(pb), "--max-delta", "2"])


def test_fit_resume_guards(tmp_path, capsys):
    """--resume refuses a checkpoint already at --steps, and one whose
    pose deltas would be silently dropped without --refine-poses."""
    import pytest

    from cudagaussianrenderer_tpu import diff
    from cudagaussianrenderer_tpu.cli import main

    p = diff.random_init(8, (-1, -1, -1), (1, 1, 1), seed=0)
    ck = tmp_path / "ck.npz"
    diff.save_checkpoint(ck, p, step=5)
    with pytest.raises(SystemExit, match="already at step 5"):
        main([
            "fit", "--procedural", "20", "--size", "32", "--steps", "5",
            "--splats", "8", "--k-max", "64",
            "--checkpoint", str(ck), "--resume",
            "-o", str(tmp_path / "x.ply"),
        ])
    diff.save_checkpoint(
        ck, p, step=2, camera_deltas=diff.zero_camera_deltas(2)
    )
    with pytest.raises(SystemExit, match="refine-poses"):
        main([
            "fit", "--procedural", "20", "--size", "32", "--steps", "5",
            "--splats", "8", "--k-max", "64",
            "--checkpoint", str(ck), "--resume",
            "-o", str(tmp_path / "x.ply"),
        ])
    with pytest.raises(SystemExit, match="needs --checkpoint"):
        main([
            "fit", "--procedural", "20", "--size", "32", "--steps", "5",
            "--splats", "8", "--k-max", "64", "--resume",
            "-o", str(tmp_path / "x.ply"),
        ])


@pytest.mark.slow
def test_render_depth_flag(tmp_path):
    """render --depth writes a normalized expected-depth PNG alongside
    the color frame."""
    from cudagaussianrenderer_tpu.cli import main
    from cudagaussianrenderer_tpu.utils.png import read_png

    out = tmp_path / "c.png"
    dep = tmp_path / "d.png"
    main([
        "render", "--procedural", "60", "--size", "32",
        "-o", str(out), "--depth", str(dep),
    ])
    img = read_png(dep)
    assert img.shape == (32, 32, 3)
    # Grayscale (all channels equal) and non-constant.
    assert (img[..., 0] == img[..., 1]).all()
    assert img.min() != img.max()


@pytest.mark.slow
def test_cli_eval_and_holdout(tmp_path, capsys):
    """cli eval scores a ground-truth scene near-perfect on its own
    rendered dataset; fit --holdout carves the llffhold split and
    reports it."""
    from cudagaussianrenderer_tpu import diff
    from cudagaussianrenderer_tpu.cli import main
    from cudagaussianrenderer_tpu.models.scene import random_scene

    ds = tmp_path / "ds"
    main(["orbit", "--procedural", "60", "--seed", "3", "--size", "32",
          "-o", str(ds), "-n", "4", "--transforms"])
    gt = tmp_path / "gt.ply"
    diff.write_fitted_ply(
        gt, diff.from_scene(random_scene(60, seed=3))
    )
    main(["eval", str(gt), "--dataset", str(ds)])
    err = capsys.readouterr().err
    assert "PSNR" in err
    psnr = float(err.split("PSNR")[1].split("dB")[0])
    assert psnr > 40  # ground truth: quantization-limited

    main([
        "fit", "--dataset", str(ds), "-o", str(tmp_path / "f.ply"),
        "--steps", "2", "--k-max", "64", "--splats", "20",
        "--holdout", "4",
    ])
    err = capsys.readouterr().err
    assert "holdout: 1 test / 3 train" in err
    assert "holdout eval" in err
