"""cudagaussianrenderer_tpu — a TPU-native 3D Gaussian-splat renderer.

A from-scratch JAX/Pallas re-design of the capabilities of the CUDA
reference renderer (etienne-p/CUDAGaussianRenderer): .ply gaussian-splat
scene ingestion, spherical harmonics to degree 4, EWA para-perspective
splat projection, exact ellipse/tile binning, depth-ordered tile lists,
and a front-to-back alpha-compositing tile rasterizer with Gaussian or
Epanechnikov falloff — expressed as statically-shaped XLA/Pallas
computations with a headless framebuffer output.

Quick start::

    from cudagaussianrenderer_tpu import (
        RenderConfig, Renderer, load_gaussian_ply, Camera,
    )
    scene = load_gaussian_ply("scene.ply")
    cam = Camera(aspect=1.0).framed(scene.bounds_min, scene.bounds_max)
    image = Renderer(scene, RenderConfig()).render(cam)  # [1024,1024,4] u8
"""

from .config import RenderConfig
from .dataset import load_posed
from .diff import (
    DiffSplats,
    fit,
    from_scene,
    init_from_points,
    load_checkpoint,
    random_init,
    render_diff,
    save_checkpoint,
    to_scene,
)
from .models.camera import Camera, CameraController, InputState, orbit_cameras
from .models.scene import GaussianScene, random_scene, scene_from_arrays
from .ply import load_gaussian_ply, write_gaussian_ply
from .render import Renderer, render_frame, render_frame_multipass
from .splatfile import load_scene

__all__ = [
    "Camera",
    "CameraController",
    "DiffSplats",
    "GaussianScene",
    "InputState",
    "RenderConfig",
    "Renderer",
    "fit",
    "from_scene",
    "init_from_points",
    "load_checkpoint",
    "load_gaussian_ply",
    "load_posed",
    "load_scene",
    "orbit_cameras",
    "random_init",
    "random_scene",
    "render_diff",
    "render_frame",
    "render_frame_multipass",
    "save_checkpoint",
    "scene_from_arrays",
    "to_scene",
    "write_gaussian_ply",
]

__version__ = "0.1.0"
