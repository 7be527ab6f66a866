"""Scene editing ops (scene_ops.py): crop/filter/decimate/merge/
transform — exact array-level oracles (the reference has no editing
tooling, SURVEY.md §2)."""

import numpy as np
import pytest

from cudagaussianrenderer_tpu import scene_ops
from cudagaussianrenderer_tpu.models.scene import random_scene, scene_from_arrays
from cudagaussianrenderer_tpu.utils.quantize import decode_quat_xyzw


def _scene(n=20, seed=0, sh_degree=0):
    return random_scene(n, seed=seed, sh_degree=sh_degree)


def test_take_slices_every_field():
    s = _scene(12, sh_degree=1)
    idx = [1, 4, 7]
    t = scene_ops.take(s, idx)
    assert t.count == 3
    np.testing.assert_array_equal(
        np.asarray(t.means), np.asarray(s.means)[:, idx]
    )
    np.testing.assert_array_equal(
        np.asarray(t.quats), np.asarray(s.quats)[idx]
    )
    np.testing.assert_array_equal(
        np.asarray(t.sh), np.asarray(s.sh)[:, :, idx]
    )
    # Bounds recomputed from the kept means.
    np.testing.assert_allclose(
        t.bounds_min, np.asarray(s.means)[:, idx].min(axis=1), atol=1e-6
    )


def test_crop_keeps_centers_in_box():
    s = _scene(50)
    m = np.asarray(s.means)[:, : s.count]
    lo, hi = (-2, -2, -2), (2, 2, 2)
    c = scene_ops.crop(s, lo, hi)
    mc = np.asarray(c.means)
    assert np.all(mc >= -2 - 1e-6) and np.all(mc <= 2 + 1e-6)
    want = np.sum(np.all((m >= -2) & (m <= 2), axis=0))
    assert c.count == want > 0


def test_filter_and_decimate():
    s = _scene(40)
    op = np.asarray(s.opacities)[: s.count]
    f = scene_ops.filter_opacity(s, 0.5)
    assert f.count == int(np.sum(op >= 0.5))
    assert np.all(np.asarray(f.opacities) >= 0.5)

    d = scene_ops.decimate(s, 10)
    assert d.count == 10
    # Importance keeps the top opacity*scale products.
    sc = np.asarray(s.scales)[:, : s.count]
    score = op * np.cbrt(sc.prod(axis=0))
    kept = set(np.argsort(-score, kind="stable")[:10].tolist())
    dm = np.asarray(d.means)
    sm = np.asarray(s.means)
    for j in range(10):
        assert any(
            np.array_equal(dm[:, j], sm[:, i]) for i in kept
        )
    assert scene_ops.decimate(s, 100) is s  # no-op above count
    r = scene_ops.decimate(s, 10, mode="random", seed=1)
    assert r.count == 10
    with pytest.raises(ValueError, match="mode"):
        scene_ops.decimate(s, 10, mode="best")


def test_merge_promotes_sh():
    a = _scene(10, seed=1, sh_degree=0)
    b = _scene(6, seed=2, sh_degree=2)
    m = scene_ops.merge([a, b])
    assert m.count == 16 and m.sh_degree == 2
    sh = np.asarray(m.sh)
    # Scene a's DC reproduces its baked color; higher bands zero.
    want_dc = (np.asarray(a.colors)[:, : a.count] - 0.5) / 0.28209479177387814
    np.testing.assert_allclose(sh[:, 0, :10], want_dc, atol=1e-6)
    assert np.all(sh[:, 1:, :10] == 0)
    np.testing.assert_array_equal(sh[:, :, 10:], np.asarray(b.sh)[:, :, : b.count])
    with pytest.raises(ValueError, match="merge"):
        scene_ops.merge([])


def test_transform_similarity():
    s = _scene(15)
    t = scene_ops.transform(s, translate=(1, 2, 3), scale=2.0)
    np.testing.assert_allclose(
        np.asarray(t.means),
        2.0 * np.asarray(s.means)[:, : s.count]
        + np.array([[1], [2], [3]], np.float32),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(t.scales), 2.0 * np.asarray(s.scales)[:, : s.count],
        rtol=1e-6,
    )
    with pytest.raises(ValueError, match="scale"):
        scene_ops.transform(s, scale=0.0)


def test_transform_rotation_composes():
    """A 90-deg world rotation moves centers exactly and composes into
    the packed rotations within the 8-bit quantization step."""
    means = np.array([[1.0, 0.0, 0.0]], np.float32)
    scales = np.full((1, 3), 0.5, np.float32)
    quats = np.array([[0.0, 0.0, 0.0, 1.0]], np.float32)  # identity
    s = scene_from_arrays(means, scales, quats, np.array([0.7], np.float32))
    # 90 deg about +z: (x,y,z,w) = (0,0,sin45,cos45).
    h = np.sqrt(0.5)
    t = scene_ops.transform(s, rotate_xyzw=np.array([0, 0, h, h]))
    np.testing.assert_allclose(
        np.asarray(t.means)[:, 0], [0.0, 1.0, 0.0], atol=1e-6
    )
    got_q = decode_quat_xyzw(np.asarray(t.quats))[0]
    got_q /= np.linalg.norm(got_q)
    want = np.array([0, 0, h, h])
    # Sign-ambiguous; 8-bit quantization step is ~1/127.
    err = min(
        np.abs(got_q - want).max(), np.abs(got_q + want).max()
    )
    assert err < 2.5 / 127


def test_empty_result_rejected():
    s = _scene(10)
    with pytest.raises(ValueError, match="empty"):
        scene_ops.crop(s, (100, 100, 100), (101, 101, 101))


def test_cli_merge_and_convert_edits(tmp_path):
    """cli merge + convert editing flags end to end on tiny scenes."""
    from cudagaussianrenderer_tpu import diff
    from cudagaussianrenderer_tpu.cli import main
    from cudagaussianrenderer_tpu.splatfile import load_scene

    a = tmp_path / "a.ply"
    b = tmp_path / "b.ply"
    diff.write_fitted_ply(a, diff.from_scene(random_scene(20, seed=1)))
    diff.write_fitted_ply(b, diff.from_scene(random_scene(10, seed=2)))
    out = tmp_path / "m.splat"
    main(["merge", str(a), str(b), "-o", str(out), "--max-splats", "25"])
    m = load_scene(out)
    assert m.count == 25

    out2 = tmp_path / "c.ply"
    main([
        "convert", str(out), str(out2),
        "--translate", "1,0,0", "--scale", "2",
    ])
    c = load_scene(out2)
    assert c.count == 25
    np.testing.assert_allclose(
        np.asarray(c.means)[:, : c.count],
        2.0 * np.asarray(m.means)[:, : m.count]
        + np.array([[1], [0], [0]], np.float32),
        atol=1e-4,
    )
