"""Posed-image dataset ingestion/export (dataset.py).

The CUDA reference has no training path and therefore no dataset layer
(SURVEY.md §2); this subsystem feeds the differentiable path from the
standard NeRF-synthetic ``transforms.json`` layout.  Oracles: exact
round-trips (camera <-> matrix, export -> load) and hand-built PNGs.
"""

import json
import math

import numpy as np
import pytest

from cudagaussianrenderer_tpu import dataset
from cudagaussianrenderer_tpu.models.camera import (
    Camera,
    orbit_cameras,
    quat_to_matrix,
)
from cudagaussianrenderer_tpu.utils.png import write_png


def _random_camera(rng, aspect=1.0):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    return Camera(
        position=rng.standard_normal(3).astype(np.float32),
        rotation=q.astype(np.float32),
        fov_y=math.radians(rng.uniform(30, 90)),
        aspect=aspect,
    )


def test_camera_transform_roundtrip():
    rng = np.random.default_rng(3)
    for aspect in (1.0, 16 / 9):
        for _ in range(10):
            cam = _random_camera(rng, aspect)
            m = dataset.camera_to_transform(cam)
            fov_x = 2.0 * math.atan(math.tan(cam.fov_y / 2) * cam.aspect)
            back = dataset.transform_to_camera(m, fov_x, aspect)
            np.testing.assert_allclose(back.position, cam.position, atol=1e-6)
            # Quaternions are sign-ambiguous; compare rotation matrices.
            np.testing.assert_allclose(
                quat_to_matrix(back.rotation),
                quat_to_matrix(cam.rotation),
                atol=1e-5,
            )
            assert back.fov_y == pytest.approx(cam.fov_y, abs=1e-9)


def test_write_and_load_transforms(tmp_path):
    rng = np.random.default_rng(0)
    cams = [_random_camera(rng) for _ in range(3)]
    names = [f"im_{i}.png" for i in range(3)]
    dataset.write_transforms(tmp_path / "transforms.json", cams, names)

    frames, fov_x, base = dataset.load_transforms(tmp_path)  # dir resolve
    assert base == tmp_path
    assert len(frames) == 3
    want_fovx = 2.0 * math.atan(math.tan(cams[0].fov_y / 2) * cams[0].aspect)
    assert fov_x == pytest.approx(want_fovx)
    for (m, rel), cam, name in zip(frames, cams, names):
        assert rel.name == name
        np.testing.assert_allclose(
            m, dataset.camera_to_transform(cam), atol=1e-12
        )


def test_load_transforms_blender_quirks(tmp_path):
    """Extension-less file_path (Blender convention) gets .png appended;
    missing camera_angle_x is rejected."""
    doc = {
        "camera_angle_x": 0.7,
        "frames": [
            {
                "file_path": "./train/r_0",
                "transform_matrix": np.eye(4).tolist(),
            }
        ],
    }
    (tmp_path / "transforms_train.json").write_text(json.dumps(doc))
    frames, fov_x, _ = dataset.load_transforms(tmp_path)
    assert frames[0][1].suffix == ".png"

    (tmp_path / "bad.json").write_text(json.dumps({"frames": []}))
    with pytest.raises(ValueError, match="camera_angle_x"):
        dataset.load_transforms(tmp_path / "bad.json")


def test_load_dataset_composites_and_downscales(tmp_path):
    # One 32x32 RGBA image: left half opaque red, right half transparent.
    img = np.zeros((32, 32, 4), np.uint8)
    img[:, :16] = (255, 0, 0, 255)
    write_png(tmp_path / "f.png", img)
    cam = Camera(aspect=1.0)
    dataset.write_transforms(tmp_path / "transforms.json", [cam], ["f.png"])

    cams, images = dataset.load_dataset(tmp_path, background=(0, 0, 1))
    assert images.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(images[0, 0, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(images[0, 0, -1], [0, 0, 1], atol=1e-6)
    assert cams[0].aspect == 1.0

    _, small = dataset.load_dataset(tmp_path, downscale=2)
    assert small.shape == (1, 16, 16, 3)
    # Block mean over the opaque-red half (black background default).
    np.testing.assert_allclose(small[0, 0, 0], [1, 0, 0], atol=1e-6)

    with pytest.raises(ValueError, match="divisible"):
        dataset.load_dataset(tmp_path, downscale=3)


def test_init_bounds_from_cameras():
    cams = orbit_cameras(
        np.array([-1.0, -1, -1], np.float32),
        np.array([1.0, 1, 1], np.float32),
        8,
    )
    lo, hi = dataset.init_bounds_from_cameras(cams)
    pos = np.stack([c.position for c in cams])
    center = pos.mean(axis=0)
    radius = np.linalg.norm(pos - center, axis=1).mean()
    np.testing.assert_allclose((lo + hi) / 2, center, atol=1e-5)
    np.testing.assert_allclose(hi - lo, 2 * 0.4 * radius, rtol=1e-5)


def test_export_then_load_roundtrip(tmp_path):
    """export_dataset writes frames the loader reproduces exactly."""
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import Renderer

    scene = random_scene(100, seed=1)
    config = RenderConfig(screen_size=32)
    renderer = Renderer(scene, config)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 2)
    tpath = dataset.export_dataset(tmp_path / "ds", renderer, cams)
    assert tpath.exists()

    got_cams, images = dataset.load_dataset(tmp_path / "ds")
    assert images.shape == (2, 32, 32, 3)
    for got, want in zip(got_cams, cams):
        np.testing.assert_allclose(got.position, want.position, atol=1e-6)
        np.testing.assert_allclose(
            quat_to_matrix(got.rotation),
            quat_to_matrix(want.rotation),
            atol=1e-5,
        )
    # Pixels round-trip through PNG + black compositing of the rendered
    # alpha; spot-check against a fresh render.
    want_img = np.asarray(renderer.render(cams[0])).astype(np.float32) / 255.0
    a = want_img[..., 3:4]
    np.testing.assert_allclose(
        images[0], want_img[..., :3] * a, atol=1 / 255 + 1e-6
    )


@pytest.mark.slow
def test_cli_fit_from_dataset(tmp_path, capsys):
    """End-to-end: orbit --transforms exports a dataset, fit --dataset
    trains against it, evaluates held-out views and writes a loadable
    .ply."""
    from cudagaussianrenderer_tpu.cli import main
    from cudagaussianrenderer_tpu.splatfile import load_scene

    ds = tmp_path / "ds"
    main(
        [
            "orbit", "--procedural", "60", "--size", "32",
            "-o", str(ds), "-n", "2", "--transforms",
        ]
    )
    assert (ds / "transforms.json").exists()

    out = tmp_path / "fitted.ply"
    main(
        [
            "fit", "--dataset", str(ds), "-o", str(out),
            "--splats", "20", "--steps", "2", "--k-max", "64",
            "--eval-dataset", str(ds),
        ]
    )
    err = capsys.readouterr().err
    assert "PSNR" in err and "SSIM" in err
    fitted = load_scene(out)
    assert fitted.count == 20
