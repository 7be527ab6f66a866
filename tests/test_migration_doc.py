"""docs/MIGRATION.md names real symbols.

The migration guide is the lookup table a reference user lands on; a
renamed function must fail here, not in their first script.  Symbols
are listed explicitly (parsing markdown is flakier than maintaining
this list next to the guide).
"""

import importlib

import pytest

# (module, attribute) pairs cited in docs/MIGRATION.md tables.
SYMBOLS = [
    ("cudagaussianrenderer_tpu.ops.sh", "evaluate_sh_colors"),
    ("cudagaussianrenderer_tpu.ops.projection", "project_splats"),
    ("cudagaussianrenderer_tpu.ops.binning", "build_tile_pairs"),
    ("cudagaussianrenderer_tpu.ops.sorting", "sort_pairs"),
    ("cudagaussianrenderer_tpu.ops.ranges", "tile_ranges"),
    ("cudagaussianrenderer_tpu.ops.raster", "rasterize_tiles"),
    ("cudagaussianrenderer_tpu.ops.raster", "tiles_to_image"),
    ("cudagaussianrenderer_tpu.ops.geometry", "ellipse_rect_overlap"),
    ("cudagaussianrenderer_tpu.ply", "load_gaussian_ply"),
    ("cudagaussianrenderer_tpu.ply", "write_gaussian_ply"),
    ("cudagaussianrenderer_tpu.render", "render_frame"),
    ("cudagaussianrenderer_tpu.render", "render_frame_multipass"),
    ("cudagaussianrenderer_tpu.render", "Renderer"),
    ("cudagaussianrenderer_tpu.models.camera", "Camera"),
    ("cudagaussianrenderer_tpu.models.camera", "CameraController"),
    ("cudagaussianrenderer_tpu.models.camera", "InputState"),
    ("cudagaussianrenderer_tpu.models.camera", "orbit_cameras"),
    ("cudagaussianrenderer_tpu.models.scene", "random_scene"),
    ("cudagaussianrenderer_tpu.utils.quantize", "encode_quat_xyzw"),
    ("cudagaussianrenderer_tpu.utils.quantize", "decode_quat_xyzw"),
    ("cudagaussianrenderer_tpu.parallel.distributed", "render_frame_sharded"),
    ("cudagaussianrenderer_tpu.parallel.distributed", "DistributedRenderer"),
    ("cudagaussianrenderer_tpu.viewer", "serve"),
]

CONFIG_FIELDS = [
    "screen_size", "screen_height", "tile_size", "falloff",
    "opacity_aware_extents", "capacity_factor", "capacity", "stable_sort",
    "sort_bands", "depth_bits", "raster_chunk", "transmittance_eps",
    "gamma",
]

CAMERA_DATA_KEYS = {"view", "position", "fov_cotangent", "depth_scale_bias",
                    "aspect"}

CLI_SUBCOMMANDS = {"render", "orbit", "bench", "interactive", "serve", "fit"}


@pytest.mark.parametrize("module,name", SYMBOLS)
def test_symbol_exists(module, name):
    assert hasattr(importlib.import_module(module), name)


def test_config_fields_exist():
    from cudagaussianrenderer_tpu.config import RenderConfig

    cfg = RenderConfig()
    for f in CONFIG_FIELDS:
        assert hasattr(cfg, f), f
    assert callable(cfg.cell_tiles)


def test_camera_data_keys():
    from cudagaussianrenderer_tpu.models.camera import Camera

    assert CAMERA_DATA_KEYS <= set(Camera(aspect=1.0).camera_data().keys())


def test_cli_subcommands(capsys):
    from cudagaussianrenderer_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["--help"])
    help_text = capsys.readouterr().out
    for cmd in CLI_SUBCOMMANDS:
        assert cmd in help_text, cmd
