"""Differentiable rendering path (diff.py).

The CUDA reference is forward-only; this subsystem is a beyond-reference
capability, so its oracle is (a) the golden NumPy renderer for forward
values and (b) finite differences for gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cudagaussianrenderer_tpu import diff
from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.golden import golden_render, scene_to_numpy
from cudagaussianrenderer_tpu.models.camera import Camera
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.render import Renderer


def _structure_and_kmax(params, cam_data, config, capacity):
    structure = diff.build_structure(params, cam_data, config, capacity)
    k_max = max(8, diff.max_tile_count(structure))
    return structure, k_max


def test_forward_matches_golden():
    """Full-precision diff forward vs the f64 oracle.

    The diff path skips the production attribute quantization entirely,
    so it should sit CLOSER to the oracle than the production renderer's
    own tolerance (pix_tol=8, 2%).  The only diff-specific deviations:
    re-normalized (still 8-bit-decoded) quaternions and the alpha_max
    clamp — both sub-LSB at these opacities."""
    scene = random_scene(300, seed=2)
    config = RenderConfig(screen_size=128)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = cam.camera_data()

    params = diff.from_scene(scene)
    structure, k_max = _structure_and_kmax(params, cam_data, config, 4096)
    image, _ = diff.render_diff(
        params, cam_data, config, 4096, k_max, structure=structure
    )
    got = np.asarray(image[..., :3] * 255.0 + 0.5).astype(np.int32)

    want = golden_render(scene_to_numpy(scene), cam_data, config)[
        ..., :3
    ].astype(np.int32)

    bad = (np.abs(got - want) > 8).any(axis=-1).mean()
    assert bad <= 0.02, f"{bad:.4f} of pixels differ by more than 8 levels"
    # Something actually rendered.
    assert got.max() > 32


@pytest.mark.slow
def test_forward_epanechnikov_matches_golden():
    scene = random_scene(200, seed=5)
    config = RenderConfig(screen_size=64, falloff="epanechnikov")
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = cam.camera_data()
    params = diff.from_scene(scene)
    structure, k_max = _structure_and_kmax(params, cam_data, config, 4096)
    image, _ = diff.render_diff(
        params, cam_data, config, 4096, k_max, structure=structure
    )
    got = np.asarray(image[..., :3] * 255.0 + 0.5).astype(np.int32)
    want = golden_render(scene_to_numpy(scene), cam_data, config)[
        ..., :3
    ].astype(np.int32)
    bad = (np.abs(got - want) > 8).any(axis=-1).mean()
    assert bad <= 0.02


@pytest.mark.slow
def test_forward_sh_matches_golden():
    """View-dependent SH colors flow through the diff path (and will
    therefore receive gradients)."""
    scene = random_scene(150, seed=7, sh_degree=2)
    config = RenderConfig(screen_size=64)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = cam.camera_data()
    params = diff.from_scene(scene)
    assert params.sh is not None and params.sh_degree == 2
    structure, k_max = _structure_and_kmax(params, cam_data, config, 4096)
    image, _ = diff.render_diff(
        params, cam_data, config, 4096, k_max, structure=structure
    )
    got = np.asarray(image[..., :3] * 255.0 + 0.5).astype(np.int32)
    want = golden_render(scene_to_numpy(scene), cam_data, config)[
        ..., :3
    ].astype(np.int32)
    bad = (np.abs(got - want) > 8).any(axis=-1).mean()
    assert bad <= 0.02


def _tiny_setup(sh_degree=0):
    """A smooth test point: mid-range opacities and colors, no pixel at
    the [0,1] clip, structure frozen — the loss is differentiable there
    and finite differences are meaningful."""
    rng = np.random.default_rng(11)
    n = 8
    means = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    scales = rng.uniform(0.2, 0.5, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.6, n).astype(np.float32)
    colors = rng.uniform(0.2, 0.7, (n, 3)).astype(np.float32)
    sh = None
    if sh_degree:
        k = (sh_degree + 1) ** 2
        sh = np.zeros((n, k, 3), np.float32)
        sh[:, 0] = (colors - 0.5) / 0.28209479177387814
        sh[:, 1:] = rng.normal(scale=0.05, size=(n, k - 1, 3))

    params = diff.DiffSplats(
        means=jnp.asarray(means.T),
        log_scales=jnp.asarray(np.log(scales).T),
        quats=jnp.asarray(q.T),
        opacity_logits=jnp.asarray(np.log(opac) - np.log1p(-opac)),
        colors=jnp.asarray(colors.T),
        sh=None if sh is None else jnp.asarray(np.transpose(sh, (2, 1, 0))),
    )
    config = RenderConfig(screen_size=32)
    cam = Camera(aspect=1.0).framed((-1.0,) * 3, (1.0,) * 3)
    cam_data = cam.camera_data()
    structure, k_max = _structure_and_kmax(params, cam_data, config, 1024)
    # Fixed random projection of the image -> a scalar, so every pixel's
    # gradient participates.
    w = jnp.asarray(
        rng.normal(size=(config.screen_h, config.screen_w, 3)).astype(
            np.float32
        )
    )

    def loss(p):
        img, _ = diff.render_diff(
            p, cam_data, config, 1024, k_max, structure=structure
        )
        return jnp.sum(img[..., :3] * w)

    return params, loss


@pytest.mark.parametrize(
    "sh_degree", [0, pytest.param(1, marks=pytest.mark.slow)]
)
def test_gradients_match_finite_differences(sh_degree):
    params, loss = _tiny_setup(sh_degree)
    grads = jax.jit(jax.grad(loss))(params)
    loss_j = jax.jit(loss)
    base_leaves = params._asdict()

    rng = np.random.default_rng(3)
    checked = 0
    for name, leaf in base_leaves.items():
        if leaf is None:
            continue
        g = np.asarray(getattr(grads, name))
        arr = np.asarray(leaf)
        flat_idx = rng.choice(arr.size, size=min(4, arr.size), replace=False)
        for fi in flat_idx:
            idx = np.unravel_index(fi, arr.shape)
            eps = 3e-3
            plus = arr.copy()
            plus[idx] += eps
            minus = arr.copy()
            minus[idx] -= eps
            lp = float(loss_j(params._replace(**{name: jnp.asarray(plus)})))
            lm = float(loss_j(params._replace(**{name: jnp.asarray(minus)})))
            fd = (lp - lm) / (2 * eps)
            ad = float(g[idx])
            scale = max(1.0, abs(fd), abs(ad))
            assert abs(fd - ad) <= 2e-2 * scale, (
                f"{name}{idx}: fd={fd:.5f} ad={ad:.5f}"
            )
            checked += 1
    assert checked >= 20


@pytest.mark.slow
def test_gradients_finite_everywhere():
    """No NaN/inf in any gradient leaf, including splats that are culled,
    saturated tiles and zero-count tiles."""
    scene = random_scene(100, seed=9)
    config = RenderConfig(screen_size=64)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = cam.camera_data()
    params = diff.from_scene(scene)
    structure, k_max = _structure_and_kmax(params, cam_data, config, 4096)

    def loss(p):
        img, _ = diff.render_diff(
            p, cam_data, config, 4096, k_max, structure=structure
        )
        return jnp.mean(img[..., :3] ** 2)

    grads = jax.jit(jax.grad(loss))(params)
    for name, g in grads._asdict().items():
        if g is None:
            continue
        assert np.isfinite(np.asarray(g)).all(), f"non-finite grads in {name}"


@pytest.mark.slow
def test_fit_reduces_loss():
    """End-to-end training smoke: recover a perturbed scene against a
    rendered target; the loss must drop by well over half."""
    scene = random_scene(60, seed=4, min_scale=0.1, max_scale=0.4)
    config = RenderConfig(screen_size=64)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = cam.camera_data()

    truth = diff.from_scene(scene)
    structure, k_max = _structure_and_kmax(truth, cam_data, config, 8192)
    target, _ = diff.render_diff(
        truth, cam_data, config, 8192, k_max, structure=structure
    )

    rng = np.random.default_rng(0)
    noisy = truth._replace(
        means=truth.means + jnp.asarray(
            rng.normal(scale=0.15, size=truth.means.shape).astype(np.float32)
        ),
        colors=jnp.asarray(
            rng.uniform(0.2, 0.8, truth.colors.shape).astype(np.float32)
        ),
    )

    fitted, losses = diff.fit(
        noisy, [cam_data], [np.asarray(target[..., :3])], config,
        capacity=8192, k_max=max(k_max, 64), steps=60, learning_rate=1e-2,
    )
    assert losses[-1] < 0.4 * losses[0], (losses[0], losses[-1])
    assert np.isfinite(losses).all()


def test_tx_3dgs_per_parameter_rates():
    """The 3DGS optimizer steps each parameter group at its own rate:
    with identical unit-RMS gradients the first-step magnitudes must
    reproduce the schedule's ratios (positions extent-scaled, opacity
    hot at 5e-2, quats cool at 1e-3, SH rest bands = DC/20), and the
    position rate must decay toward final_ratio x by the last step."""
    import optax

    n, k, extent, steps = 8, 4, 10.0, 100
    params = diff.DiffSplats(
        means=jnp.zeros((3, n)),
        log_scales=jnp.zeros((3, n)),
        quats=jnp.zeros((4, n)),
        opacity_logits=jnp.zeros((n,)),
        colors=jnp.zeros((3, n)),
        sh=jnp.zeros((3, k, n)),
    )
    ones = jax.tree_util.tree_map(jnp.ones_like, params)
    tx = diff.tx_3dgs(extent, steps)
    state = tx.init(params)
    upd, state = tx.update(ones, state, params)
    # Adam with constant unit gradients normalizes to ~1 (bias-corrected
    # m/sqrt(v) = 1 exactly on step 1), so |update| == the group rate.
    assert float(jnp.abs(upd.means).max()) == pytest.approx(
        1.6e-4 * extent, rel=1e-4
    )
    assert float(jnp.abs(upd.opacity_logits).max()) == pytest.approx(
        5e-2, rel=1e-4
    )
    assert float(jnp.abs(upd.quats).max()) == pytest.approx(1e-3, rel=1e-4)
    assert float(jnp.abs(upd.log_scales).max()) == pytest.approx(
        5e-3, rel=1e-4
    )
    assert float(jnp.abs(upd.colors).max()) == pytest.approx(2.5e-3, rel=1e-4)
    sh = np.abs(np.asarray(upd.sh))
    assert sh[:, 0].max() == pytest.approx(2.5e-3, rel=1e-4)
    assert sh[:, 1:].max() == pytest.approx(2.5e-3 / 20.0, rel=1e-4)
    # All updates are descent-signed.
    assert float(upd.means.max()) < 0
    # Position rate decays ~x100 across the run (the other groups hold).
    for _ in range(steps):
        upd, state = tx.update(ones, state, params)
    assert float(jnp.abs(upd.means).max()) == pytest.approx(
        1.6e-4 * extent * 0.01, rel=1e-3
    )
    assert float(jnp.abs(upd.opacity_logits).max()) == pytest.approx(
        5e-2, rel=1e-4
    )
    # And it drives fit() end to end (sh=None branch included).
    params2 = params._replace(sh=None, colors=jnp.full((3, n), 0.5))
    tx2 = diff.tx_3dgs(extent, 3)
    assert isinstance(tx2, optax.GradientTransformation)


@pytest.mark.slow
def test_fit_3dgs_optimizer_reduces_loss():
    """fit(tx=tx_3dgs(...)) with the paper loss (L1+D-SSIM, no L2)
    trains: same recovery setup as test_fit_reduces_loss."""
    scene = random_scene(60, seed=4, min_scale=0.1, max_scale=0.4)
    config = RenderConfig(screen_size=64)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = cam.camera_data()

    truth = diff.from_scene(scene)
    structure, k_max = _structure_and_kmax(truth, cam_data, config, 8192)
    target, _ = diff.render_diff(
        truth, cam_data, config, 8192, k_max, structure=structure
    )

    rng = np.random.default_rng(0)
    noisy = truth._replace(
        means=truth.means + jnp.asarray(
            rng.normal(scale=0.15, size=truth.means.shape).astype(np.float32)
        ),
        colors=jnp.asarray(
            rng.uniform(0.2, 0.8, truth.colors.shape).astype(np.float32)
        ),
    )
    extent = float(np.linalg.norm(
        np.asarray(scene.bounds_max) - np.asarray(scene.bounds_min)
    ))
    fitted, losses = diff.fit(
        noisy, [cam_data], [np.asarray(target[..., :3])], config,
        capacity=8192, k_max=max(k_max, 64), steps=60,
        tx=diff.tx_3dgs(extent, 60),
        l1_weight=0.8, ssim_weight=0.2, l2_weight=0.0,
    )
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_to_scene_roundtrip_renders_close():
    """from_scene -> to_scene only loses the 8-bit rotation requantization;
    the production render of the round-tripped scene matches."""
    scene = random_scene(200, seed=6)
    config = RenderConfig(screen_size=64)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)

    back = diff.to_scene(diff.from_scene(scene))
    a = Renderer(scene, config).render(cam)
    b = Renderer(back, config).render(cam)
    bad = (
        (np.abs(a.astype(np.int32) - b.astype(np.int32)) > 8)
        .any(axis=-1)
        .mean()
    )
    assert bad <= 0.02


@pytest.mark.slow
def test_empty_frame_renders_black_with_finite_grads():
    """A camera looking away from every splat: zero pairs, black image,
    and gradients are all-zero but FINITE (no NaN from the culled
    branches)."""
    scene = random_scene(50, seed=1)
    config = RenderConfig(screen_size=32)
    cam = Camera(aspect=1.0, position=np.array([500.0, 500.0, 500.0]))
    cam_data = cam.camera_data()
    params = diff.from_scene(scene)
    structure = diff.build_structure(params, cam_data, config, 1024)
    assert diff.max_tile_count(structure) == 0

    def loss(p):
        img, _ = diff.render_diff(
            p, cam_data, config, 1024, 8, structure=structure
        )
        return jnp.sum(img[..., :3])

    val = float(jax.jit(loss)(params))
    assert val == 0.0
    grads = jax.jit(jax.grad(loss))(params)
    for name, g in grads._asdict().items():
        if g is None:
            continue
        a = np.asarray(g)
        assert np.isfinite(a).all(), name
        assert np.abs(a).max() == 0.0, name


@pytest.mark.slow
def test_fit_warns_on_capacity_saturation():
    scene = random_scene(200, seed=2)
    config = RenderConfig(screen_size=64)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = cam.camera_data()
    params = diff.from_scene(scene)
    target = np.zeros((64, 64, 3), np.float32)
    with pytest.warns(RuntimeWarning, match="candidate pairs exceed"):
        diff.fit(
            params, [cam_data], [target], config,
            capacity=128, k_max=32, steps=2, learning_rate=1e-3,
        )


@pytest.mark.slow
def test_degree0_sh_params_render():
    """DiffSplats with a K=1 SH tensor uses the DC-band affine map."""
    scene = random_scene(100, seed=3)
    config = RenderConfig(screen_size=64)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = cam.camera_data()
    p0 = diff.from_scene(scene)
    sh = ((np.clip(np.asarray(p0.colors), 0, 1) - 0.5)
          / 0.28209479177387814)[:, None]
    p1 = p0._replace(sh=jnp.asarray(sh))
    assert p1.sh_degree == 0
    st = diff.build_structure(p1, cam_data, config, 4096)
    k = max(8, diff.max_tile_count(st))
    a, _ = diff.render_diff(p0, cam_data, config, 4096, k, structure=st)
    b, _ = diff.render_diff(p1, cam_data, config, 4096, k, structure=st)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ssim_properties():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    assert float(diff.ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    s_ab = float(diff.ssim(a, b))
    assert s_ab < 0.5  # independent noise
    assert s_ab == pytest.approx(float(diff.ssim(b, a)), abs=1e-6)
    # A mild blur-like perturbation scores higher than independent noise.
    c = jnp.clip(a + 0.05, 0.0, 1.0)
    assert float(diff.ssim(a, c)) > s_ab
    # Differentiable and finite.
    g = jax.grad(lambda x: diff.ssim(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_ssim_flat_images_bounded_and_differentiable():
    """Degenerate flat patches (zero true variance) are where the
    moment cancellation lives: on the TPU MXU the default-precision
    convs run in bf16 and blur(a*a) - mu^2 picks up ~1e-3 error —
    enough to flip the SSIM denominator sign (c2 = 9e-4) and drive
    the D-SSIM training loss below 0 (seen live at fit step 540).
    ssim now forces f32 conv precision and clamps the moments to
    their invariants (var >= 0, |cov| <= sqrt(var_a var_b)), which
    pins SSIM into [-1, 1] on every backend.  The clamp's sqrt hits
    var = 0 exactly here, so this also guards the stop_gradient
    against d(sqrt)/dx -> inf at 0."""
    rng = np.random.default_rng(3)
    flat = jnp.full((64, 64, 3), 0.5, jnp.float32)
    noisy = jnp.asarray(
        np.clip(
            0.5 + 0.05 * rng.standard_normal((64, 64, 3)), 0.0, 1.0
        ).astype(np.float32)
    )
    for x, y in [(flat, flat), (flat, noisy), (flat, 1.0 - flat)]:
        s = float(diff.ssim(x, y))
        assert -1.0 <= s <= 1.0
        g = jax.grad(lambda im: diff.ssim(im, y))(x)
        assert np.isfinite(np.asarray(g)).all()
    assert float(diff.ssim(flat, flat)) == pytest.approx(1.0, abs=1e-5)


def test_densify_and_prune_rules():
    """Clone small hot splats, split large hot ones (into two shrunk
    samples, parent removed), prune sub-floor opacities."""
    n = 6
    rng = np.random.default_rng(1)
    q = rng.normal(size=(4, n)).astype(np.float32)
    params = diff.DiffSplats(
        means=jnp.zeros((3, n), jnp.float32),
        log_scales=jnp.asarray(
            np.log(
                np.array(
                    [[0.01, 0.01, 0.5, 0.5, 0.01, 0.01]] * 3, np.float32
                )
            )
        ),
        quats=jnp.asarray(q),
        # splat 4 is below the 1/255 prune floor; others mid-range.
        opacity_logits=jnp.asarray(
            np.array([0.0, 0.0, 0.0, 0.0, -8.0, 0.0], np.float32)
        ),
        colors=jnp.full((3, n), 0.5, jnp.float32),
    )
    # hot: 0 (small -> clone), 2 (large -> split); 4 is hot but pruned.
    g = np.array([1.0, 0.0, 1.0, 0.0, 1.0, 0.0], np.float32)
    out = diff.densify_and_prune(
        params, g, grad_threshold=0.5, dense_scale=0.1, scene_extent=1.0
    )
    # survivors: 0,1,3,5 (4 pruned, 2 replaced) + clone of 0 + 2 children.
    assert out.means.shape[-1] == 4 + 1 + 2
    ls = np.asarray(out.log_scales)
    # the two children carry the parent's scale / 1.6
    child = np.isclose(ls[0], np.log(0.5) - np.log(1.6), atol=1e-5)
    assert child.sum() == 2
    # growth respects max_splats: budget 0 cancels the clone AND the
    # split (whose parent then survives unsplit) -> the 5 keepers only.
    capped = diff.densify_and_prune(
        params, g, grad_threshold=0.5, dense_scale=0.1, scene_extent=1.0,
        max_splats=4,
    )
    assert capped.means.shape[-1] == 5


@pytest.mark.slow
def test_fit_with_densification_grows_and_converges():
    scene = random_scene(80, seed=4, min_scale=0.1, max_scale=0.4)
    config = RenderConfig(screen_size=64)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = cam.camera_data()
    truth = diff.from_scene(scene)
    structure, k_max = _structure_and_kmax(truth, cam_data, config, 8192)
    target, _ = diff.render_diff(
        truth, cam_data, config, 8192, k_max, structure=structure
    )
    start = diff.random_init(
        20, scene.bounds_min, scene.bounds_max, seed=1, scale=0.3
    )
    fitted, losses = diff.fit(
        start, [cam_data], [np.asarray(target[..., :3])], config,
        capacity=8192, k_max=max(k_max, 128), steps=40,
        learning_rate=1e-2, densify_every=10,
        densify_args=dict(grad_threshold=1e-5, dense_scale=0.05),
    )
    assert fitted.means.shape[-1] > 20  # densification actually grew it
    assert losses[-1] < 0.7 * losses[0]
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_k_max_truncation_is_prefix():
    """k_max below the max tile count truncates the BACK of each tile's
    list (the front-to-back prefix still blends)."""
    scene = random_scene(300, seed=2)
    config = RenderConfig(screen_size=64)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = cam.camera_data()
    params = diff.from_scene(scene)
    structure, k_max = _structure_and_kmax(params, cam_data, config, 4096)
    full, _ = diff.render_diff(
        params, cam_data, config, 4096, k_max, structure=structure
    )
    half, _ = diff.render_diff(
        params, cam_data, config, 4096, max(8, k_max // 2),
        structure=structure,
    )
    # Truncated image loses only far-behind contributions: it never
    # exceeds the full image's accumulated color by more than float fuzz
    # ... in the log-domain both are exact prefixes, so per-pixel
    # half <= full + eps on every channel is the invariant.
    assert np.all(
        np.asarray(half[..., :3]) <= np.asarray(full[..., :3]) + 1e-4
    )


def test_apply_camera_delta_identity_and_host_parity():
    """Zero deltas are exactly the identity; a finite delta applied on
    the device pytree matches baking it into a host Camera."""
    cam = Camera(aspect=1.0).framed((-1.0,) * 3, (1.0,) * 3)
    cd = cam.camera_data()
    out = diff.apply_camera_delta(
        {k: jnp.asarray(v) for k, v in cd.items()},
        jnp.zeros(3), jnp.zeros(3),
    )
    np.testing.assert_allclose(np.asarray(out["view"]), cd["view"], atol=0)
    np.testing.assert_allclose(
        np.asarray(out["position"]), cd["position"], atol=0
    )

    dr = np.array([0.03, -0.02, 0.05], np.float32)
    dt = np.array([0.1, -0.2, 0.05], np.float32)
    out = diff.apply_camera_delta(
        {k: jnp.asarray(v) for k, v in cd.items()},
        jnp.asarray(dr), jnp.asarray(dt),
    )
    baked = diff.refined_camera(cam, dr, dt).camera_data()
    np.testing.assert_allclose(np.asarray(out["view"]), baked["view"],
                               atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out["position"]), baked["position"], atol=2e-6
    )
    # Intrinsics untouched.
    np.testing.assert_array_equal(
        np.asarray(out["fov_cotangent"]), cd["fov_cotangent"]
    )


def test_rodrigues_matches_axis_angle_and_grad_at_zero():
    from cudagaussianrenderer_tpu.models.camera import quat_to_matrix

    rng = np.random.default_rng(5)
    for _ in range(5):
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        angle = rng.uniform(0.01, 2.5)
        h = angle / 2
        q = np.concatenate([[np.cos(h)], np.sin(h) * axis]).astype(
            np.float32
        )
        want = quat_to_matrix(q)
        got = np.asarray(diff._rodrigues(jnp.asarray(angle * axis,
                                                     jnp.float32)))
        np.testing.assert_allclose(got, want, atol=1e-5)
    # Gradient is finite exactly at zero (the Taylor branch).
    g = jax.grad(lambda r: jnp.sum(diff._rodrigues(r) * 2.0))(
        jnp.zeros(3)
    )
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_pose_refinement_recovers_perturbed_camera():
    """Targets rendered with TRUE cameras; fit sees perturbed poses with
    frozen (ground-truth) splats.  With optimize_cameras the pose
    deltas must recover most of the loss the perturbation introduced."""
    import optax

    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import Renderer

    scene = random_scene(60, seed=9)
    config = RenderConfig(screen_size=32)
    renderer = Renderer(scene, config)
    true_cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 2)
    targets = [
        np.asarray(renderer.render(c))[..., :3].astype(np.float32) / 255.0
        for c in true_cams
    ]
    # Perturb each pose (rotation ~1.7 deg, translation ~2% of extent).
    extent = float(
        np.linalg.norm(
            np.asarray(scene.bounds_max) - np.asarray(scene.bounds_min)
        )
    )
    rng = np.random.default_rng(3)
    perturbed = [
        diff.refined_camera(
            c,
            0.03 * rng.standard_normal(3),
            0.02 * extent * rng.standard_normal(3),
        )
        for c in true_cams
    ]
    params = diff.from_scene(scene)
    cam_data = [c.camera_data() for c in perturbed]
    frozen = optax.sgd(0.0)  # splats stay at ground truth

    def run(**kw):
        return diff.fit(
            params, cam_data, targets, config,
            capacity=4096, k_max=256, steps=40,
            tx=frozen, l2_weight=1.0, **kw,
        )

    _, losses_fixed = run()
    _, losses_posed, deltas = run(
        optimize_cameras=True, camera_lr=3e-3
    )
    # Same start (zero deltas), decisive improvement only with poses.
    assert losses_posed[0] == pytest.approx(losses_fixed[0], rel=1e-5)
    assert losses_posed[-1] < 0.5 * losses_fixed[-1]
    assert np.all(np.isfinite(np.asarray(deltas.dr)))
    assert float(np.max(np.abs(np.asarray(deltas.dr)))) < 0.2


@pytest.mark.slow
def test_checkpoint_resume_continues_trajectory(tmp_path):
    """fit(6) matches fit(3) -> checkpoint -> resume(3) to tight tolerance
    (same optimizer, same camera rotation, same step indexing)."""
    import optax

    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import Renderer

    scene = random_scene(40, seed=2)
    config = RenderConfig(screen_size=32)
    renderer = Renderer(scene, config)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 2)
    targets = [
        np.asarray(renderer.render(c))[..., :3].astype(np.float32) / 255.0
        for c in cams
    ]
    cam_data = [c.camera_data() for c in cams]
    init = diff.random_init(30, scene.bounds_min, scene.bounds_max, seed=1)
    kw = dict(capacity=2048, k_max=128, l2_weight=1.0,
              optimize_cameras=True, camera_lr=1e-3)
    tx = optax.adam(5e-3)

    straight, losses_a, deltas_a = diff.fit(
        init, cam_data, targets, config, steps=6, tx=tx, **kw
    )

    ckpt = tmp_path / "fit.npz"
    diff.fit(
        init, cam_data, targets, config, steps=3, tx=tx,
        checkpoint_every=3, checkpoint_path=ckpt, **kw
    )
    ck = diff.load_checkpoint(ckpt, tx=tx)
    assert ck["step"] == 3
    assert ck["opt_state"] is not None
    assert ck["camera_deltas"] is not None
    resumed, losses_b, deltas_b = diff.fit(
        ck["params"], cam_data, targets, config, steps=6, tx=tx,
        start_step=ck["step"], opt_state=ck["opt_state"],
        camera_deltas=ck["camera_deltas"], **kw
    )
    for a, b in zip(straight, resumed):
        if a is None:
            assert b is None
            continue
        # Camera-adam moments warm-restart on resume (documented), so
        # the trajectories agree tightly rather than bitwise.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-3
        )
    np.testing.assert_allclose(losses_a[3:], losses_b[3:], atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(deltas_a.dr), np.asarray(deltas_b.dr), atol=3e-3
    )


def test_checkpoint_roundtrip_fields(tmp_path):
    """save/load preserve every DiffSplats leaf (incl. SH), the step,
    and pose deltas; opt_state needs the matching tx."""
    import optax

    p = diff.random_init(12, (-1, -1, -1), (1, 1, 1), seed=0, sh_degree=1)
    d = diff.CameraDeltas(
        dr=jnp.asarray(np.random.default_rng(0).standard_normal((3, 3)),
                       jnp.float32),
        dt=jnp.ones((3, 3), jnp.float32),
    )
    tx = optax.adam(1e-2)
    st = tx.init(p)
    path = tmp_path / "ck.npz"
    diff.save_checkpoint(path, p, step=7, opt_state=st, camera_deltas=d)
    ck = diff.load_checkpoint(path, tx=tx)
    assert ck["step"] == 7
    for name in p._fields:
        a, b = getattr(p, name), getattr(ck["params"], name)
        if a is None:
            assert b is None
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(ck["camera_deltas"].dr), np.asarray(d.dr)
    )
    # Without tx the optimizer state is not reconstructed.
    assert diff.load_checkpoint(path)["opt_state"] is None

    # Bare paths (no .npz) save and load the same file (np.savez
    # appends the suffix on write).
    bare = tmp_path / "ck2"
    diff.save_checkpoint(bare, p, step=1)
    assert (tmp_path / "ck2.npz").exists()
    assert diff.load_checkpoint(bare)["step"] == 1


def test_expected_depth_blend_and_grads():
    """return_depth: for two huge stacked splats the center-pixel depth
    is the hand-blended a1*z1 + (1-a1)*a2*z2 with z from the projection
    stage, and gradients flow to the means through the depth output."""
    n = 2
    means = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, -1.0]], np.float32)
    scales = np.full((n, 3), 1.2, np.float32)  # cover the screen center
    quats = np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1))
    opac = np.array([0.4, 0.7], np.float32)
    colors = np.full((n, 3), 0.5, np.float32)
    params = diff.DiffSplats(
        means=jnp.asarray(means.T),
        log_scales=jnp.asarray(np.log(scales).T),
        quats=jnp.asarray(quats.T),
        opacity_logits=jnp.asarray(np.log(opac) - np.log1p(-opac)),
        colors=jnp.asarray(colors.T),
    )
    config = RenderConfig(screen_size=32)
    cam = Camera(position=np.array([0, 0, 6], np.float32))
    cd = cam.camera_data()

    image, depth, structure = diff.render_diff(
        params, cd, config, 1024, 64, return_depth=True
    )
    assert depth.shape == (32, 32)

    clip_data, opacities = diff._project(params, cd, config)
    z = np.asarray(clip_data.z)
    a = np.asarray(opacities)
    # Front-to-back order: splat 0 (z smaller = closer; the sort key is
    # ascending depth).
    order = np.argsort(z)
    a1, a2 = a[order[0]], a[order[1]]
    z1, z2 = z[order[0]], z[order[1]]
    want = a1 * z1 + (1 - a1) * a2 * z2
    got = float(np.asarray(depth)[16, 16])
    # Density at the center pixel is slightly below 1 (pixel-corner
    # convention); tolerance covers it.
    assert got == pytest.approx(float(want), rel=0.02)

    g = jax.grad(
        lambda p: jnp.sum(
            diff.render_diff(
                p, cd, config, 1024, 64, structure=structure,
                return_depth=True,
            )[1]
        )
    )(params)
    gm = np.asarray(g.means)
    assert np.all(np.isfinite(gm)) and np.any(gm != 0)


@pytest.mark.slow
def test_depth_supervised_fit_moves_depth():
    """A depth-only loss pulls a splat's depth toward the target: fit a
    single splat whose z is off by 0.5 against the true depth map."""
    import optax  # noqa: F401  (fit's default optimizer import path)

    def make(zoff):
        means = np.array([[0.0, 0.0, zoff]], np.float32)
        return diff.DiffSplats(
            means=jnp.asarray(means.T),
            log_scales=jnp.full((3, 1), np.log(1.0), jnp.float32),
            quats=jnp.asarray(np.array([[0, 0, 0, 1]], np.float32).T),
            opacity_logits=jnp.full((1,), 2.0, jnp.float32),
            colors=jnp.full((3, 1), 0.5, jnp.float32),
        )

    config = RenderConfig(screen_size=32)
    cam = Camera(position=np.array([0, 0, 5], np.float32))
    cd = cam.camera_data()
    _, dtarget, _ = diff.render_diff(
        make(0.0), cd, config, 512, 32, return_depth=True
    )
    target_img = np.zeros((32, 32, 3), np.float32)  # color term off

    def depth_err(p):
        _, d, _ = diff.render_diff(p, cd, config, 512, 32,
                                   return_depth=True)
        return float(np.mean(np.abs(np.asarray(d) - np.asarray(dtarget))))

    p0 = make(0.5)
    err0 = depth_err(p0)
    fitted, losses = diff.fit(
        p0, [cd], [target_img], config,
        capacity=512, k_max=32, steps=40, learning_rate=2e-2,
        l2_weight=0.0, depth_weight=1.0,
        depth_targets=[np.asarray(dtarget)],
    )
    err1 = depth_err(fitted)
    assert err1 < 0.3 * err0
    assert losses[-1] < losses[0]
    # Mismatched target count is rejected.
    import pytest as _pt
    with _pt.raises(ValueError, match="depth targets"):
        diff.fit(
            p0, [cd], [target_img], config, capacity=512, k_max=32,
            steps=1, depth_weight=1.0, depth_targets=[dtarget, dtarget],
        )


@pytest.mark.slow
def test_exposure_refinement_recovers_per_view_gain():
    """Targets get per-view synthetic exposure shifts; with
    optimize_exposure the learned gains track the shifts and the loss
    lands well below the fixed-exposure fit (splats frozen at truth)."""
    import optax

    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import Renderer

    scene = random_scene(60, seed=12)
    config = RenderConfig(screen_size=32)
    renderer = Renderer(scene, config)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 2)
    shifts = np.array([[1.25, 1.25, 1.25], [0.8, 0.8, 0.8]], np.float32)
    targets = [
        np.clip(
            np.asarray(renderer.render(c))[..., :3].astype(np.float32)
            / 255.0 * shifts[i],
            0.0, 1.0,
        )
        for i, c in enumerate(cams)
    ]
    params = diff.from_scene(scene)
    cam_data = [c.camera_data() for c in cams]
    frozen = optax.sgd(0.0)

    def run(**kw):
        return diff.fit(
            params, cam_data, targets, config,
            capacity=4096, k_max=256, steps=30, tx=frozen,
            l2_weight=1.0, **kw,
        )

    _, losses_fixed = run()
    _, losses_exp, exp = run(optimize_exposure=True, exposure_lr=3e-2)
    assert losses_exp[-1] < 0.5 * losses_fixed[-1]
    g = np.asarray(exp.gain)
    # Gains move toward the applied shifts (direction, not exactness —
    # clipping and 30 steps limit it).
    assert g[0].mean() > 1.05 and g[1].mean() < 0.95


@pytest.mark.slow
def test_sh_warmup_masks_band_gradients():
    """sh_warmup_every: bands above the active degree receive no
    updates early; after the warm-up threshold they start moving."""
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import Renderer

    scene = random_scene(40, seed=6, sh_degree=2)
    config = RenderConfig(screen_size=32)
    renderer = Renderer(scene, config)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, 1)
    targets = [
        np.asarray(renderer.render(cams[0]))[..., :3].astype(np.float32)
        / 255.0
    ]
    params = diff.from_scene(scene)
    cd = [cams[0].camera_data()]

    # 3 steps with warm-up every 4: active degree stays 0 throughout.
    fitted, _ = diff.fit(
        params, cd, targets, config, capacity=2048, k_max=128,
        steps=3, learning_rate=1e-2, l2_weight=1.0, sh_warmup_every=4,
    )
    sh0 = np.asarray(params.sh)
    sh1 = np.asarray(fitted.sh)
    np.testing.assert_array_equal(sh1[:, 1:], sh0[:, 1:])  # frozen
    assert np.any(sh1[:, 0] != sh0[:, 0])  # DC trains

    # 5 steps with warm-up every 4: degree-1 bands unlock at step 4.
    fitted2, _ = diff.fit(
        params, cd, targets, config, capacity=2048, k_max=128,
        steps=5, learning_rate=1e-2, l2_weight=1.0, sh_warmup_every=4,
    )
    sh2 = np.asarray(fitted2.sh)
    assert np.any(sh2[:, 1:4] != sh0[:, 1:4])   # band 1 moved
    np.testing.assert_array_equal(sh2[:, 4:], sh0[:, 4:])  # band 2 frozen


@pytest.mark.slow
def test_remat_gradients_match():
    """jax.checkpoint over the blend chunks changes memory, not math:
    loss and gradients are identical with and without remat."""
    params, _ = _tiny_setup()
    config = RenderConfig(screen_size=32)
    cam = Camera(aspect=1.0).framed((-1.0,) * 3, (1.0,) * 3).camera_data()

    def loss(p, remat):
        img, _ = diff.render_diff(p, cam, config, 1024, 64, remat=remat)
        return jnp.sum(img[..., :3] ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for a, b in zip(g0, g1):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
