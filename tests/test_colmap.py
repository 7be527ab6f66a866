"""COLMAP sparse-model ingestion (colmap.py) and the SfM splat init
(diff.init_from_points).

The CUDA reference has no dataset layer (SURVEY.md §2); oracles here
are exact binary/text round-trips, the OpenCV<->OpenGL pose algebra
checked through the production view matrix, and hand-computable knn
geometry for the init recipe.
"""

import math
import struct

import numpy as np
import pytest

from cudagaussianrenderer_tpu import colmap, dataset
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


def _write_txt_model(sparse, cams, images, xyz, rgb):
    lines = ["# cameras"]
    for c in cams:
        lines.append(
            f"{c.camera_id} {c.model} {c.width} {c.height} "
            + " ".join(repr(float(p)) for p in c.params)
        )
    (sparse / "cameras.txt").write_text("\n".join(lines) + "\n")
    lines = ["# images"]
    for im in images:
        q, t = im.qvec, im.tvec
        lines.append(
            " ".join([str(im.image_id)] + [repr(float(v)) for v in q]
                     + [repr(float(v)) for v in t]
                     + [str(im.camera_id), im.name])
        )
        lines.append("")  # empty 2D-observations line
    (sparse / "images.txt").write_text("\n".join(lines) + "\n")
    lines = ["# points"]
    rgb8 = (np.asarray(rgb) * 255 + 0.5).astype(int)
    for i, (p, c) in enumerate(zip(xyz, rgb8)):
        lines.append(
            " ".join([str(i + 1)] + [repr(float(v)) for v in p]
                     + [str(int(v)) for v in c] + ["0.5"])
        )
    (sparse / "points3D.txt").write_text("\n".join(lines) + "\n")


def test_bin_roundtrip(tmp_path):
    cams = [
        colmap.ColmapCamera(
            1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320.0, 240.0])
        ),
        colmap.ColmapCamera(
            2, "SIMPLE_PINHOLE", 64, 64, np.array([80.0, 32.0, 32.0])
        ),
    ]
    rng = np.random.default_rng(0)
    images = [
        colmap.ColmapImage(
            i + 1,
            rng.standard_normal(4),
            rng.standard_normal(3),
            1 + (i % 2),
            f"sub/frame_{i:03d}.jpg",
        )
        for i in range(3)
    ]
    xyz = rng.standard_normal((5, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, (5, 3)).astype(np.float32)

    colmap.write_cameras_bin(tmp_path / "cameras.bin", cams)
    colmap.write_images_bin(tmp_path / "images.bin", images)
    colmap.write_points3d_bin(tmp_path / "points3D.bin", xyz, rgb)

    got_cams = colmap.read_cameras_bin(tmp_path / "cameras.bin")
    assert set(got_cams) == {1, 2}
    for want in cams:
        got = got_cams[want.camera_id]
        assert (got.model, got.width, got.height) == (
            want.model, want.width, want.height
        )
        np.testing.assert_array_equal(got.params, want.params)

    got_images = colmap.read_images_bin(tmp_path / "images.bin")
    for got, want in zip(got_images, images):
        assert got.image_id == want.image_id
        assert got.camera_id == want.camera_id
        assert got.name == want.name
        np.testing.assert_array_equal(got.qvec, want.qvec)
        np.testing.assert_array_equal(got.tvec, want.tvec)

    got_xyz, got_rgb = colmap.read_points3d_bin(tmp_path / "points3D.bin")
    np.testing.assert_allclose(got_xyz, xyz, atol=1e-6)
    np.testing.assert_allclose(got_rgb, rgb, atol=0.5 / 255)


def test_images_bin_skips_observations(tmp_path):
    """The 2D-observation payload after each image record is length-
    prefixed and skipped; a record with observations parses cleanly."""
    with open(tmp_path / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<dddd", 1.0, 0.0, 0.0, 0.0))
        f.write(struct.pack("<ddd", 0.5, -1.0, 2.0))
        f.write(struct.pack("<i", 3))
        f.write(b"a.png\x00")
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ddq", 1.0, 2.0, -1))
        f.write(struct.pack("<ddq", 3.0, 4.0, 11))
    (img,) = colmap.read_images_bin(tmp_path / "images.bin")
    assert (img.image_id, img.camera_id, img.name) == (7, 3, "a.png")
    np.testing.assert_array_equal(img.tvec, [0.5, -1.0, 2.0])


def test_txt_bin_parity(tmp_path):
    """The text parser produces the same model as the binary one."""
    rng = np.random.default_rng(1)
    cams = [
        colmap.ColmapCamera(
            1, "PINHOLE", 320, 240, np.array([300.0, 290.0, 160.0, 120.0])
        )
    ]
    images = [
        colmap.ColmapImage(
            i + 1,
            rng.standard_normal(4),
            rng.standard_normal(3),
            1,
            f"v_{i}.png",
        )
        for i in range(2)
    ]
    xyz = rng.standard_normal((4, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, (4, 3)).astype(np.float32)

    bdir = tmp_path / "bin"
    bdir.mkdir()
    colmap.write_cameras_bin(bdir / "cameras.bin", cams)
    colmap.write_images_bin(bdir / "images.bin", images)
    colmap.write_points3d_bin(bdir / "points3D.bin", xyz, rgb)
    tdir = tmp_path / "txt"
    tdir.mkdir()
    _write_txt_model(tdir, cams, images, xyz, rgb)

    mb = colmap.load_model(bdir)
    mt = colmap.load_model(tdir)
    assert set(mb.cameras) == set(mt.cameras)
    for cid in mb.cameras:
        np.testing.assert_allclose(
            mb.cameras[cid].params, mt.cameras[cid].params, rtol=1e-15
        )
    assert [i.name for i in mb.images] == [i.name for i in mt.images]
    for a, b in zip(mb.images, mt.images):
        np.testing.assert_allclose(a.qvec, b.qvec, rtol=1e-15)
        np.testing.assert_allclose(a.tvec, b.tvec, rtol=1e-15)
    np.testing.assert_allclose(mb.points_xyz, mt.points_xyz, atol=1e-6)
    np.testing.assert_allclose(mb.points_rgb, mt.points_rgb, atol=0.5 / 255)


def test_pose_roundtrip_and_view_matrix():
    """camera_to_pose / pose_to_camera invert each other, and a COLMAP
    pose lands points on the production view matrix's OpenGL axes: a
    point COLMAP sees at camera-frame (0, 0, d) must sit at view-space
    (0, 0, -d)."""
    rng = np.random.default_rng(2)
    intr = colmap.ColmapCamera(
        1, "PINHOLE", 640, 480, np.array([400.0, 400.0, 320.0, 240.0])
    )
    for _ in range(10):
        cam = _random_camera(rng, aspect=640 / 480)
        cam = Camera(
            position=cam.position,
            rotation=cam.rotation,
            fov_y=2.0 * math.atan(480 / (2 * 400.0)),
            aspect=640 / 480,
        )
        qvec, tvec = colmap.camera_to_pose(cam)
        img = colmap.ColmapImage(1, qvec, tvec, 1, "x.png")
        back = colmap.pose_to_camera(img, intr)
        np.testing.assert_allclose(back.position, cam.position, atol=1e-5)
        np.testing.assert_allclose(
            quat_to_matrix(back.rotation),
            quat_to_matrix(cam.rotation),
            atol=1e-5,
        )
        assert back.fov_y == pytest.approx(cam.fov_y, abs=1e-6)
        assert back.aspect == pytest.approx(cam.aspect)

        # Axis convention: map a world point 3 units down the COLMAP
        # optical axis through the production view matrix.
        r_w2c = colmap.qvec_to_rotmat(qvec)
        world = r_w2c.T @ np.array([0.0, 0.0, 3.0]) + (
            -r_w2c.T @ np.asarray(tvec)
        )
        view = back.view() @ np.append(world, 1.0)
        np.testing.assert_allclose(view[:3], [0, 0, -3.0], atol=1e-4)


def test_pose_to_camera_rejects_distortion():
    intr = colmap.ColmapCamera(
        1, "SIMPLE_RADIAL", 64, 64, np.array([80.0, 32.0, 32.0, 0.1])
    )
    img = colmap.ColmapImage(
        1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "a.png"
    )
    with pytest.raises(colmap.ColmapError, match="image_undistorter"):
        colmap.pose_to_camera(img, intr)


def test_export_then_load_dataset(tmp_path):
    """export_model + rendered PNGs load back as a fit-ready dataset:
    cameras match, images match, points survive."""
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import Renderer

    scene = random_scene(100, seed=1)
    config = RenderConfig(screen_size=32)
    renderer = Renderer(scene, config)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 3)
    xyz = np.asarray(scene.means).T[:50].astype(np.float32)
    rgb = np.full((50, 3), 0.5, np.float32)

    root = tmp_path / "ws"
    imdir = root / "images"
    imdir.mkdir(parents=True)
    names = []
    for i, cam in enumerate(cams):
        name = f"frame_{i:04d}.png"
        write_png(imdir / name, renderer.render(cam))
        names.append(name)
    sparse = colmap.export_model(root, cams, names, 32, 32, xyz, rgb)
    assert (sparse / "cameras.bin").exists()
    assert colmap.find_sparse_dir(root) == sparse

    got_cams, images, pxyz, prgb, got_names = colmap.load_dataset(root)
    assert images.shape == (3, 32, 32, 3)
    assert got_names == names
    np.testing.assert_allclose(pxyz, xyz, atol=1e-6)
    for got, want in zip(got_cams, cams):
        np.testing.assert_allclose(got.position, want.position, atol=1e-5)
        np.testing.assert_allclose(
            quat_to_matrix(got.rotation),
            quat_to_matrix(want.rotation),
            atol=1e-5,
        )
    # Pixels: PNG + black compositing, like dataset.load_dataset.
    want_img = (
        np.asarray(renderer.render(cams[0])).astype(np.float32) / 255.0
    )
    np.testing.assert_allclose(
        images[0],
        want_img[..., :3] * want_img[..., 3:4],
        atol=1 / 255 + 1e-6,
    )

    # The front door dispatches to the COLMAP loader by layout.
    ds = dataset.load_posed(root)
    assert ds.points_xyz.shape == (50, 3)
    assert ds.images.shape == (3, 32, 32, 3)


def test_load_posed_transforms_fallback(tmp_path):
    """A transforms.json layout goes through the NeRF-synthetic loader
    (empty point cloud)."""
    rng = np.random.default_rng(0)
    cams = [_random_camera(rng) for _ in range(2)]
    img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    for i in range(2):
        write_png(tmp_path / f"im_{i}.png", img)
    dataset.write_transforms(
        tmp_path / "transforms.json", cams, ["im_0.png", "im_1.png"]
    )
    ds = dataset.load_posed(tmp_path)
    assert ds.points_xyz.shape == (0, 3)
    assert ds.images.shape == (2, 8, 8, 3)


def test_init_from_points():
    from cudagaussianrenderer_tpu import diff

    # 4 points on a unit segment grid: nearest-neighbor geometry is
    # hand-computable.
    xyz = np.array(
        [[0, 0, 0], [1, 0, 0], [2, 0, 0], [10, 0, 0]], np.float32
    )
    rgb = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32
    )
    p = diff.init_from_points(xyz, rgb)
    assert p.means.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(p.means).T, xyz, atol=1e-6)
    # Point 0's 3 nearest neighbors are at distances 1, 2, 10.
    want0 = math.log((1 + 2 + 10) / 3)
    np.testing.assert_allclose(
        np.asarray(p.log_scales)[:, 0], want0, rtol=1e-5
    )
    # Isotropic, identity rotation, opacity 0.1 through the sigmoid.
    np.testing.assert_allclose(
        np.asarray(p.log_scales).std(axis=0), 0.0, atol=1e-7
    )
    import jax.nn

    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(p.opacity_logits)), 0.1, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(p.colors).T, rgb, atol=1e-6)

    # SH degree: DC term carries the color, rest zero.
    p1 = diff.init_from_points(xyz, rgb, sh_degree=1)
    assert p1.sh.shape == (3, 4, 4)
    np.testing.assert_allclose(
        np.asarray(p1.sh)[:, 0],
        (rgb.T - 0.5) / 0.28209479177387814,
        rtol=1e-5,
    )
    assert np.all(np.asarray(p1.sh)[:, 1:] == 0)

    # Subsampling and degenerate clouds stay usable.
    ps = diff.init_from_points(xyz, rgb, max_points=2)
    assert ps.means.shape == (3, 2)
    pd = diff.init_from_points(
        np.zeros((3, 3), np.float32), np.zeros((3, 3), np.float32)
    )
    assert np.all(np.isfinite(np.asarray(pd.log_scales)))
    with pytest.raises(ValueError, match="empty"):
        diff.init_from_points(
            np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
        )


@pytest.mark.slow
def test_cli_fit_from_colmap(tmp_path, capsys):
    """End-to-end: a COLMAP workspace (exported model + rendered PNGs)
    drives fit --dataset with the SfM point-cloud init."""
    from cudagaussianrenderer_tpu.cli import main
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import Renderer
    from cudagaussianrenderer_tpu.splatfile import load_scene

    scene = random_scene(60, seed=3)
    renderer = Renderer(scene, RenderConfig(screen_size=32))
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 2)
    root = tmp_path / "ws"
    (root / "images").mkdir(parents=True)
    names = []
    for i, cam in enumerate(cams):
        name = f"r_{i}.png"
        write_png(root / "images" / name, renderer.render(cam))
        names.append(name)
    colmap.export_model(
        root, cams, names, 32, 32,
        np.asarray(scene.means).T[: scene.count].astype(np.float32),
        np.full((scene.count, 3), 0.5, np.float32),
    )

    out = tmp_path / "fitted.ply"
    main(
        [
            "fit", "--dataset", str(root), "-o", str(out),
            "--steps", "2", "--k-max", "64", "--sh-degree", "1",
        ]
    )
    err = capsys.readouterr().err
    assert "SfM point" in err
    fitted = load_scene(out)
    assert fitted.count == scene.count  # one splat per SfM point
    assert fitted.sh_degree == 1  # --sh-degree reaches the fitted model


def test_pinhole_anisotropic_focal_aspect():
    """PINHOLE with fx != fy (non-square pixels): the Camera aspect must
    satisfy cot_x = cot_y / aspect = 2*fx/w, i.e. aspect = w*fy/(h*fx)."""
    intr = colmap.ColmapCamera(
        1, "PINHOLE", 640, 480, np.array([300.0, 400.0, 320.0, 240.0])
    )
    img = colmap.ColmapImage(
        1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "a.png"
    )
    cam = colmap.pose_to_camera(img, intr)
    assert cam.fov_y == pytest.approx(2 * math.atan(480 / (2 * 400.0)))
    assert cam.aspect == pytest.approx((640 * 400.0) / (480 * 300.0))
    cot_y = 1.0 / math.tan(cam.fov_y / 2)
    assert cot_y / cam.aspect == pytest.approx(2 * 300.0 / 640)


def test_images_txt_names_with_spaces(tmp_path):
    (tmp_path / "images.txt").write_text(
        "# comment\n"
        "1 1.0 0.0 0.0 0.0 0.5 0.5 0.5 1 my photo 01.jpg\n"
        "\n"
    )
    (img,) = colmap.read_images_txt(tmp_path / "images.txt")
    assert img.name == "my photo 01.jpg"


def test_grayscale_jpeg_loads(tmp_path):
    """Grayscale JPEGs go through the PIL branch and the block-average
    downscale without losing the channel axis."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "ws"
    (root / "images").mkdir(parents=True)
    arr = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    Image.fromarray(arr, mode="L").save(root / "images" / "g.jpg")
    cam = Camera(aspect=1.0)
    colmap.export_model(root, [cam], ["g.jpg"], 16, 16)
    cams, images, _, _, names = colmap.load_dataset(root, downscale=2)
    assert images.shape == (1, 8, 8, 3)
    assert names == ["g.jpg"]
    # All three channels replicate the gray values.
    np.testing.assert_array_equal(images[0, ..., 0], images[0, ..., 1])


def test_truncated_bin_files_raise_colmap_error(tmp_path):
    """Corrupt/truncated binaries surface as ColmapError, not raw
    struct errors: every prefix truncation of each bin file."""
    cams = [colmap.ColmapCamera(1, "PINHOLE", 8, 8,
                                np.array([8.0, 8.0, 4.0, 4.0]))]
    imgs = [colmap.ColmapImage(1, np.array([1.0, 0, 0, 0]),
                               np.zeros(3), 1, "a.png")]
    colmap.write_cameras_bin(tmp_path / "cameras.bin", cams)
    colmap.write_images_bin(tmp_path / "images.bin", imgs)
    colmap.write_points3d_bin(
        tmp_path / "points3D.bin",
        np.zeros((2, 3), np.float32), np.zeros((2, 3), np.float32),
    )
    for name, reader in (
        ("cameras.bin", colmap.read_cameras_bin),
        ("images.bin", colmap.read_images_bin),
        ("points3D.bin", colmap.read_points3d_bin),
    ):
        data = (tmp_path / name).read_bytes()
        for cut in (1, len(data) // 2, len(data) - 1):
            p = tmp_path / f"cut_{name}"
            p.write_bytes(data[:cut])
            with pytest.raises(colmap.ColmapError):
                reader(p)


@pytest.mark.slow
def test_cli_orbit_colmap_roundtrip(tmp_path, capsys):
    """orbit --colmap writes a workspace fit --dataset consumes with
    the point-cloud init."""
    from cudagaussianrenderer_tpu.cli import main

    ws = tmp_path / "ws"
    main(["orbit", "--procedural", "50", "--size", "32",
          "-o", str(ws), "-n", "2", "--colmap"])
    assert (ws / "sparse" / "0" / "cameras.bin").exists()
    assert (ws / "images" / "frame_0000.png").exists()
    out = tmp_path / "f.ply"
    main(["fit", "--dataset", str(ws), "-o", str(out),
          "--steps", "1", "--k-max", "64"])
    err = capsys.readouterr().err
    assert "SfM point" in err
