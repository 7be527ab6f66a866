"""Opaque background compositing (config.background).

Beyond-reference: the CUDA reference clears to transparent black
(Demo.cpp:399) and writes alpha 255 on covered tiles only; the 3DGS
evaluation protocol renders over white/black, so config.background
composites an opaque color under the blended splats with each pixel's
remaining transmittance — in the production Pallas raster, the golden
oracle, and the differentiable path alike.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.golden import golden_render, scene_to_numpy
from cudagaussianrenderer_tpu.models.camera import Camera
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.render import Renderer

WHITE = (1.0, 1.0, 1.0)


def _image_close(got, want, *, pix_tol=8, frac=0.02, msg=""):
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    bad = (diff > pix_tol).any(axis=-1).mean()
    assert bad <= frac, f"{msg}: {bad:.4f} of pixels differ by more than {pix_tol}"


@pytest.mark.slow
def test_white_background_matches_golden():
    scene = random_scene(300, seed=2)
    config = RenderConfig(screen_size=128, background=WHITE)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    got = Renderer(scene, config).render(cam)
    want = golden_render(scene_to_numpy(scene), cam.camera_data(), config)
    assert (got[..., 3] == 255).all()  # opaque everywhere in this mode
    _image_close(got, want, msg="white-bg")
    # and it is genuinely different from the black-clear default
    plain = Renderer(scene, RenderConfig(screen_size=128)).render(cam)
    assert int(np.abs(got[..., :3].astype(int) - plain[..., :3].astype(int)).max()) > 64


def test_colored_background_fills_empty_view():
    scene = random_scene(50, seed=4)
    bg = (0.2, 0.5, 0.8)
    config = RenderConfig(screen_size=64, background=bg)
    cam = Camera(position=np.array([0.0, 0.0, -500.0], np.float32), aspect=1.0)
    img = Renderer(scene, config).render(cam)
    want = np.array([round(c * 255) for c in bg] + [255], np.int32)
    assert np.abs(img.astype(np.int32) - want).max() <= 1


def test_background_none_is_reference_exact():
    # The default path's program must be bit-identical with the field
    # present-but-None (trace-time gate).
    scene = random_scene(200, seed=9)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    a = Renderer(scene, RenderConfig(screen_size=64)).render(cam)
    b = Renderer(scene, RenderConfig(screen_size=64, background=None)).render(cam)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_background_validation():
    with pytest.raises(ValueError, match="background"):
        RenderConfig(background=(2.0, 0.0, 0.0))
    with pytest.raises(ValueError, match="background"):
        RenderConfig(background=(0.5, 0.5))
    # lists normalize to hashable tuples (jit static arg requirement)
    cfg = RenderConfig(background=[0.25, 0.5, 0.75])
    assert cfg.background == (0.25, 0.5, 0.75)
    hash(cfg)


@pytest.mark.slow
def test_diff_background_matches_production_and_grads_flow():
    from cudagaussianrenderer_tpu import diff

    scene = random_scene(60, seed=5)
    config = RenderConfig(screen_size=64, background=WHITE)
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    cam_data = jax.tree.map(jnp.asarray, cam.camera_data())

    params = diff.from_scene(scene)
    structure = diff.build_structure(params, cam_data, config, 4096)
    k_max = max(8, diff.max_tile_count(structure))
    img, _ = diff.render_diff(
        params, cam_data, config, 4096, k_max, structure=structure
    )
    prod = Renderer(scene, config).render(cam)
    _image_close(
        (np.asarray(img) * 255).astype(np.uint8), np.asarray(prod),
        pix_tol=8, frac=0.02, msg="diff-vs-prod white-bg",
    )

    # The background term must backpropagate: an occluding splat's
    # opacity gradient includes -T * bg through the composite.
    def loss(p):
        im, _ = diff.render_diff(
            p, cam_data, config, 4096, k_max, structure=structure
        )
        return jnp.sum(im[..., :3])

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g.opacity_logits)).all()
    assert float(np.abs(np.asarray(g.opacity_logits)).max()) > 0
