"""Camera math + the headless drag/orbit/pan controller state machine
(reference: CameraControls.{h,cpp})."""

import numpy as np

from cudagaussianrenderer_tpu.models.camera import (
    Camera,
    CameraController,
    InputState,
    UP,
    quat_to_matrix,
)


def _controller(size=(512.0, 512.0)):
    c = CameraController(size)
    c.set_bounds((-4.0, -4.0, -4.0), (4.0, 4.0, 4.0))
    return c


def test_view_is_inverse_of_pose():
    cam = Camera(aspect=1.0).framed((-4,) * 3, (4,) * 3)
    v = cam.view()
    # view @ [position, 1] == origin
    p = v @ np.array([*cam.position, 1.0], np.float32)
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)
    # rotation part orthonormal
    np.testing.assert_allclose(v[:3, :3] @ v[:3, :3].T, np.eye(3), atol=1e-5)


def test_depth_scale_bias_endpoints():
    """Linear z map: view z = -near -> clip -1, -far -> +1 (Demo.cpp:386-392)."""
    cam = Camera(aspect=1.0)
    s, b = cam.depth_scale_bias()
    assert np.isclose(s * -cam.near + b, -1.0, atol=1e-6)
    assert np.isclose(s * -cam.far + b, 1.0, atol=1e-5)


def test_world_ray_hits_screen_center_forward():
    cam = Camera(aspect=1.0).framed((-4,) * 3, (4,) * 3)
    origin, direction = cam.world_ray(np.array([256.0, 256.0]), np.array([512.0, 512.0]))
    # The ray unprojects the near plane (getWorldSpaceRay,
    # CameraControls.cpp:98-113): its origin sits `near` in front of the
    # camera, along the ray.
    to_cam = origin - cam.position
    assert np.linalg.norm(np.cross(to_cam, direction)) < 1e-3  # passes through camera
    np.testing.assert_allclose(np.linalg.norm(to_cam), cam.near, atol=1e-3)
    forward = quat_to_matrix(cam.rotation) @ np.array([0.0, 0.0, -1.0])
    np.testing.assert_allclose(direction, forward / np.linalg.norm(forward), atol=1e-4)


def test_fly_moves_along_local_axes():
    c = _controller()
    p0 = c.camera.position.copy()
    cam = c.update(InputState(move=(0.0, 0.0, -1.0)), dt=1.0)  # forward (-z)
    forward = quat_to_matrix(cam.rotation) @ np.array([0.0, 0.0, -1.0])
    moved = cam.position - p0
    # speed scales with scene size: max bound 8 * 0.02
    np.testing.assert_allclose(moved, forward * c.speed, atol=1e-5)
    assert np.isclose(c.speed, 8.0 * 0.02)


def test_drag_rotates_in_place():
    c = _controller()
    p0 = c.camera.position.copy()
    r0 = c.camera.rotation.copy()
    c.update(InputState(pointer=(100.0, 100.0), buttons="left"), dt=0.016)
    cam = c.update(InputState(pointer=(150.0, 100.0), buttons="left"), dt=0.016)
    np.testing.assert_allclose(cam.position, p0, atol=1e-6)  # no translation
    assert not np.allclose(cam.rotation, r0)  # rotated
    # roll removal keeps the right axis horizontal
    right = quat_to_matrix(cam.rotation) @ np.array([1.0, 0.0, 0.0])
    assert abs(right @ UP) < 1e-5


def test_orbit_preserves_anchor_distance():
    c = _controller()
    anchor = c.anchor.copy()
    d0 = np.linalg.norm(c.camera.position - anchor)
    c.update(InputState(pointer=(256.0, 256.0), buttons="middle"), dt=0.016)
    cam = c.update(InputState(pointer=(300.0, 280.0), buttons="middle"), dt=0.016)
    d1 = np.linalg.norm(cam.position - anchor)
    assert np.isclose(d0, d1, rtol=1e-5)  # orbit radius preserved
    assert not np.allclose(cam.position, c.anchor)


def test_pan_translates_without_rotation():
    c = _controller()
    r0 = c.camera.rotation.copy()
    p0 = c.camera.position.copy()
    c.update(InputState(pointer=(256.0, 256.0), buttons="right"), dt=0.016)
    c.update(InputState(pointer=(256.0, 256.0), buttons="right"), dt=0.016)
    cam = c.update(InputState(pointer=(300.0, 256.0), buttons="right"), dt=0.016)
    np.testing.assert_allclose(cam.rotation, r0, atol=1e-7)  # no rotation
    assert not np.allclose(cam.position, p0)  # translated


def test_release_returns_to_idle_anchor_tracking():
    c = _controller()
    c.update(InputState(pointer=(256.0, 256.0), buttons="left"), dt=0.016)
    c.update(InputState(pointer=(256.0, 256.0), buttons="none"), dt=0.016)
    assert c.mode == "none"


def test_framed_degenerate_bounds_stays_finite():
    """A single-splat scene (bounds_min == bounds_max) or inf bounds
    must not produce a 0/0 NaN camera pose — framed() falls back to
    viewing the center from unit distance."""
    cam = Camera(aspect=1.0).framed([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])
    assert np.isfinite(cam.position).all()
    assert np.isfinite(cam.rotation).all()
    d = cam.camera_data()
    assert all(np.isfinite(np.asarray(v)).all() for v in d.values())

    cam2 = Camera(aspect=1.0).framed(
        [np.inf, np.inf, np.inf], [-np.inf, -np.inf, -np.inf]
    )
    assert np.isfinite(cam2.position).all()
    assert np.isfinite(cam2.rotation).all()
