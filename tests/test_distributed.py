"""Multi-chip sharded rendering on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import Camera, orbit_cameras
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.parallel.distributed import (
    DistributedRenderer,
    make_mesh,
    make_mesh_2d,
    render_frame_sharded,
    render_frames_sharded,
    stack_cameras,
)
from cudagaussianrenderer_tpu.render import Renderer, render_frame

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple devices"
)


@pytest.mark.slow
def test_sharded_matches_single_device():
    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_dev)
    config = RenderConfig(screen_size=128)
    scene = random_scene(128 * n_dev, seed=7).pad_to_multiple(128 * n_dev)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    capacity = 8192

    img_s, aux_s = jax.jit(
        lambda s, c: render_frame_sharded(s, c, config, capacity, mesh)
    )(scene, cam.camera_data())
    img_1, aux_1 = jax.jit(
        lambda s, c: render_frame(s, c, config, capacity)
    )(scene, cam.camera_data())

    img_s, img_1 = np.asarray(img_s), np.asarray(img_1)
    assert img_s.shape == img_1.shape
    # Same per-tile pair lists => identical rasterization; tiny diffs can
    # only come from sort-tie ordering, which the stable sort removes.
    diff = np.abs(img_s.astype(np.int32) - img_1.astype(np.int32))
    assert (diff > 1).mean() < 0.001, f"max diff {diff.max()}"
    # Band-clamped rects partition the pair set exactly across devices:
    # the sharded sum equals the single-device pair count.
    assert int(np.asarray(aux_s["num_pairs"])) == int(np.asarray(aux_1["num_pairs"]))


@pytest.mark.slow
def test_sharded_saturation_truncates():
    """A too-small per-device capacity truncates but stays shape-correct
    and reports saturation via the pmax'd candidate count."""
    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_dev)
    config = RenderConfig(screen_size=128)
    scene = random_scene(256 * n_dev, seed=3).pad_to_multiple(256 * n_dev)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)

    img, aux = jax.jit(
        lambda s, c: render_frame_sharded(s, c, config, 256, mesh)
    )(scene, cam.camera_data())
    assert np.asarray(img).shape == (128, 128, 4)
    assert int(np.asarray(aux["num_candidates"])) > 256  # saturated signal


@pytest.mark.slow
def test_distributed_renderer_padding_and_capacity():
    """DistributedRenderer pads non-divisible splat counts and adapts
    per-device capacity from the saturation signal."""
    n_dev = min(8, len(jax.devices()))
    config = RenderConfig(screen_size=128)
    scene = random_scene(1000, seed=5)  # NOT divisible by 256 * n_dev
    r = DistributedRenderer(scene, config, mesh=make_mesh(n_dev))
    assert r.scene.padded_count % (256 * n_dev) == 0
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    img = r.render(cam)
    assert img.shape == (128, 128, 4)
    cap0 = r.capacity
    img2 = r.render(cam)
    assert img2.shape == (128, 128, 4)
    assert r.capacity <= cap0  # adapted to the measured candidate count

    # Single-device Renderer comparison (same scene padding semantics).
    ref = Renderer(scene, config).render(cam)
    diff = np.abs(ref.astype(np.int32) - img2.astype(np.int32))
    assert (diff > 1).mean() < 0.001


@pytest.mark.slow
def test_frame_parallel_2d_mesh():
    n_total = min(8, len(jax.devices()))
    if n_total < 4:
        pytest.skip("needs 4 devices for a 2x2 mesh")
    mesh = make_mesh_2d(2, 2)
    config = RenderConfig(screen_size=128)
    scene = random_scene(512, seed=9).pad_to_multiple(512)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 4)
    batch = stack_cameras(cams)

    imgs, aux = jax.jit(
        lambda s, c: render_frames_sharded(s, c, config, 8192, mesh)
    )(scene, batch)
    imgs = np.asarray(imgs)
    assert imgs.shape == (4, 128, 128, 4)

    # Each frame matches its single-device render.
    for i, cam in enumerate(cams):
        ref, _ = jax.jit(
            lambda s, c: render_frame(s, c, config, 8192)
        )(scene, cam.camera_data())
        diff = np.abs(imgs[i].astype(np.int32) - np.asarray(ref).astype(np.int32))
        assert (diff > 1).mean() < 0.001, f"frame {i}: max diff {diff.max()}"


@pytest.mark.slow
def test_distributed_renderer_render_batch_2d():
    n_total = min(8, len(jax.devices()))
    if n_total < 4:
        pytest.skip("needs 4 devices for a 2x2 mesh")
    config = RenderConfig(screen_size=128)
    scene = random_scene(500, seed=11)
    r = DistributedRenderer(scene, config, mesh=make_mesh_2d(2, 2))
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 4)
    imgs = r.render_batch(cams)
    assert imgs.shape == (4, 128, 128, 4)


@pytest.mark.slow  # the driver itself exercises this entry every round
def test_graft_entry_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(min(8, len(jax.devices())))


@pytest.mark.slow
def test_distributed_renderer_custom_axis_names():
    """Mesh axis names are user-chosen; the renderer must forward them to
    both the per-frame and the batched sharded paths (the batched path
    once hardcoded 'frames'/'tiles' and KeyError'd on custom names)."""
    import numpy as np

    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.parallel.distributed import (
        DistributedRenderer,
        make_mesh_2d,
    )

    scene = random_scene(400, seed=7)
    config = RenderConfig(screen_size=128)
    r = DistributedRenderer(
        scene, config, mesh=make_mesh_2d(2, 2, axes=("f", "t"))
    )
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 2)
    imgs = r.render_batch(cams)
    assert imgs.shape == (2, 128, 128, 4)
    assert np.asarray(imgs)[..., 3].max() == 255


@pytest.mark.slow
def test_render_batch_1d_mesh_single_dispatch():
    """A 1-axis mesh batch renders via the device-side lax.map path and
    matches per-frame renders exactly."""
    n_dev = min(8, len(jax.devices()))
    config = RenderConfig(screen_size=128)
    scene = random_scene(400, seed=13)
    r = DistributedRenderer(scene, config, mesh=make_mesh(n_dev))
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 3)
    imgs = r.render_batch(cams, check_saturation=False)
    assert imgs.shape == (3, 128, 128, 4)
    for i, cam in enumerate(cams):
        np.testing.assert_array_equal(imgs[i], r.render(cam, check_saturation=False))


@pytest.mark.slow
def test_dp_train_step_matches_mean_gradient():
    """One fit_dp step over D devices equals a single-device sgd step
    on the MEAN of the per-view gradients (params replicated, grads
    pmean'd — the definition of data parallelism)."""
    import optax

    from cudagaussianrenderer_tpu import diff
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.parallel import train
    from cudagaussianrenderer_tpu.render import Renderer

    n_dev = 4
    scene = random_scene(50, seed=3)
    config = RenderConfig(screen_size=32)
    r = Renderer(scene, config)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, n_dev)
    targets = [
        np.asarray(r.render(c))[..., :3].astype(np.float32) / 255.0
        for c in cams
    ]
    cd = [c.camera_data() for c in cams]
    params = diff.random_init(24, scene.bounds_min, scene.bounds_max,
                              seed=2)
    capacity, k_max = 2048, 128
    lr = 1e-2
    from jax.sharding import Mesh as _Mesh
    mesh = _Mesh(np.asarray(jax.devices()[:n_dev]), ("dp",))

    step, _ = train.make_train_step_dp(
        config, capacity, k_max, optax.sgd(lr), mesh,
        l1_weight=0.0, ssim_weight=0.0, l2_weight=1.0,
    )
    cams_b, tgts_b = train.view_batch(cd, targets)
    opt_state = optax.sgd(lr).init(params)
    dp_params, _, dp_loss = step(params, opt_state, cams_b, tgts_b)

    # Single-device oracle: average the per-view L2 gradients by hand.
    def one_loss(p, cam, t):
        img, _ = diff.render_diff(p, cam, config, capacity, k_max)
        e = img[..., :3] - t
        return jnp.mean(e * e)

    grads = [
        jax.grad(one_loss)(params, cd[i], jnp.asarray(targets[i]))
        for i in range(n_dev)
    ]
    mean_g = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / n_dev, *grads
    )
    want = jax.tree_util.tree_map(
        lambda p, g: None if p is None else p - lr * g, params, mean_g
    )
    for a, b in zip(dp_params, want):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )
    # Loss is the view mean.
    want_loss = np.mean([
        float(one_loss(params, cd[i], jnp.asarray(targets[i])))
        for i in range(n_dev)
    ])
    assert float(dp_loss) == pytest.approx(want_loss, rel=1e-5)


@pytest.mark.slow
def test_fit_dp_pads_views_by_cycling():
    """A view count not divisible by the mesh cycles views (never drops
    them): 3 views on 2 devices -> groups of 2 covering all 3."""
    import optax

    from cudagaussianrenderer_tpu import diff
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.parallel import train
    from cudagaussianrenderer_tpu.render import Renderer

    from jax.sharding import Mesh as _Mesh

    scene = random_scene(30, seed=1)
    config = RenderConfig(screen_size=32)
    r = Renderer(scene, config)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 3)
    targets = [
        np.asarray(r.render(c))[..., :3].astype(np.float32) / 255.0
        for c in cams
    ]
    cd = [c.camera_data() for c in cams]
    params = diff.random_init(16, scene.bounds_min, scene.bounds_max,
                              seed=0)
    mesh = _Mesh(np.asarray(jax.devices()[:2]), ("dp",))
    fitted, losses = train.fit_dp(
        params, cd, targets, config, capacity=1024, k_max=64,
        mesh=mesh, steps=4, tx=optax.sgd(1e-3),
        l1_weight=0.0, ssim_weight=0.0, l2_weight=1.0,
    )
    assert np.all(np.isfinite(losses))
    assert np.any(
        np.asarray(fitted.means) != np.asarray(params.means)
    )


def test_band_bounds_properties():
    """Equal-work boundaries are monotone, feasible (1..max_rows rows per
    band) and track the weight distribution on skewed inputs."""
    from cudagaussianrenderer_tpu.parallel.distributed import _band_bounds

    ty = 64
    for seed, n_dev, max_rows in [(0, 4, 32), (1, 8, 16), (2, 2, 64)]:
        rng = np.random.default_rng(seed)
        # Heavy skew: exponential weights concentrated in a few rows.
        w = jnp.asarray(rng.exponential(1.0, ty) ** 3, jnp.float32)
        b = np.asarray(_band_bounds(w, n_dev, max_rows))
        assert b[0] == 0 and b[-1] == ty
        sizes = np.diff(b)
        assert (sizes >= 1).all() and (sizes <= max_rows).all(), (b, max_rows)
        # Worst band at most ~1 row's weight above the ideal share when
        # unconstrained by max_rows (coarse-granularity bound).
        shares = np.add.reduceat(np.asarray(w), b[:-1])
        if (sizes < max_rows).all():
            assert shares.max() <= w.sum() / n_dev + np.asarray(w).max() + 1e-5
    # Degenerate all-zero weights still give a valid partition.
    b = np.asarray(_band_bounds(jnp.zeros(8, jnp.float32), 4, 4))
    assert b[0] == 0 and b[-1] == 8 and (np.diff(b) >= 1).all()


@pytest.mark.slow
def test_balanced_bands_match_single_device():
    """config.balanced_bands: per-frame equal-work bands render the same
    image as single-device and cut the worst band on a skewed scene."""
    import dataclasses

    n_dev = min(4, len(jax.devices()))
    mesh = make_mesh(n_dev)
    # Stable sort: the heavily-overdrawn skewed fixture has many equal
    # 19-bit depth keys per tile, and the balanced-band vs flat pair
    # ORDER among ties differs; both paths emit splat-major, so the
    # stable sort makes the tile segments identical and the comparison
    # exact instead of threshold-chasing tie noise.
    config = RenderConfig(screen_size=128, stable_sort=True)
    bconfig = dataclasses.replace(config, balanced_bands=True)
    scene = random_scene(512 * n_dev, seed=7).pad_to_multiple(256 * n_dev)
    # Skew: squash all splats into the top 15% of the bounding box so the
    # uniform top band carries most of the pairs.
    m = np.array(scene.means)
    m[1] = m[1].max() - (m[1] - m[1].min()) * 0.15
    scene = dataclasses.replace(scene, means=jnp.asarray(m))
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cap = 32768

    img_u, aux_u = jax.jit(
        lambda s, c: render_frame_sharded(s, c, config, cap, mesh)
    )(scene, cam.camera_data())
    img_b, aux_b = jax.jit(
        lambda s, c: render_frame_sharded(s, c, bconfig, cap, mesh)
    )(scene, cam.camera_data())
    img_1, aux_1 = jax.jit(
        lambda s, c: render_frame(s, c, config, cap * n_dev)
    )(scene, cam.camera_data())

    img_b, img_1 = np.asarray(img_b), np.asarray(img_1)
    assert img_b.shape == img_1.shape
    diff = np.abs(img_b.astype(np.int32) - img_1.astype(np.int32))
    assert (diff > 1).mean() < 0.001, f"max diff {diff.max()}"
    # Same exact pair partition as uniform bands and single device.
    assert int(np.asarray(aux_b["num_pairs"])) == int(np.asarray(aux_1["num_pairs"]))
    # Balance: the pmax'd worst-band candidate count shrinks vs uniform.
    u = int(np.asarray(aux_u["num_candidates"]))
    b = int(np.asarray(aux_b["num_candidates"]))
    assert b < u, f"balanced worst band {b} should beat uniform {u}"


@pytest.mark.slow
def test_render_band_reconstructs_balanced_image():
    """parallel.distributed.render_band (the single-chip validation and
    measurement surface for the balanced path) is the exact per-device
    program: summing its placed frames over dev reproduces the
    mesh-rendered balanced image bit-exactly."""
    from cudagaussianrenderer_tpu.parallel.distributed import render_band

    n_dev = min(4, len(jax.devices()))
    mesh = make_mesh(n_dev)
    config = RenderConfig(screen_size=128, balanced_bands=True)
    scene = random_scene(512 * n_dev, seed=7).pad_to_multiple(256 * n_dev)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cap = 32768

    img_mesh, aux_mesh = jax.jit(
        lambda s, c: render_frame_sharded(s, c, config, cap, mesh)
    )(scene, cam.camera_data())

    f = jax.jit(render_band, static_argnums=(2, 3, 4, 5))
    total = np.zeros(np.asarray(img_mesh).shape, np.int32)
    pairs = 0
    for d in range(n_dev):
        full, aux = f(scene, cam.camera_data(), config, cap, n_dev, d)
        total += np.asarray(full).astype(np.int32)
        pairs += int(np.asarray(aux["num_pairs"]))
    np.testing.assert_array_equal(total, np.asarray(img_mesh).astype(np.int32))
    # Bands partition the pair set exactly.
    assert pairs == int(np.asarray(aux_mesh["num_pairs"]))
