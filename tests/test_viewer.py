"""Live HTTP viewer (viewer.serve): endpoints + input-driven camera.

The L1 presentation layer — the reference's GLFW window + event loop
(Demo.cpp:196-237, 484-525) as a dependency-free HTTP server.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.render import Renderer
from cudagaussianrenderer_tpu.utils.png import read_png
from cudagaussianrenderer_tpu.viewer import serve


def _get(url, timeout=60):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.read()


def _post(url, payload, timeout=10):
    req = urllib.request.Request(url, data=json.dumps(payload).encode())
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


@pytest.mark.slow
def test_viewer_serves_and_responds_to_input():
    scene = random_scene(200, seed=3)
    config = RenderConfig(screen_size=128)
    renderer = Renderer(scene, config)
    port = 8841
    ready = threading.Event()
    holder = {}

    def run():
        holder["state"] = serve(
            renderer, scene, config,
            port=port, fps_cap=1000.0, max_frames=0, ready=ready,
        )

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(30)
    base = f"http://127.0.0.1:{port}"

    def frame_no():
        return json.loads(_get(base + "/stats"))["frame"]

    def wait_frames(n, timeout=120.0):
        target = frame_no() + n
        deadline = time.monotonic() + timeout
        while frame_no() < target:
            assert time.monotonic() < deadline, "render loop stalled"
            time.sleep(0.05)

    try:
        page = _get(base + "/").decode()
        assert "/stream" in page and "mousedown" in page

        img0 = read_png(_get(base + "/frame.png"))
        assert img0.shape == (128, 128, 4)
        assert img0[..., 3].max() == 255

        stats = json.loads(_get(base + "/stats"))
        assert stats["capacity"] > 0

        # Drag-rotate: two pointer positions on DIFFERENT frames while
        # the left button is held (the controller uses frame deltas).
        _post(base + "/input", {"pointer": [5, 64], "buttons": "left"})
        wait_frames(2)
        _post(base + "/input", {"pointer": [120, 64], "buttons": "left"})
        wait_frames(2)
        _post(base + "/input", {"pointer": [120, 64], "buttons": "none"})
        wait_frames(1)
        img1 = read_png(_get(base + "/frame.png"))
        d = np.abs(img0.astype(int) - img1.astype(int))
        assert (d > 4).any(axis=-1).mean() > 0.01  # the view moved

        # Bad input returns 400 without killing the loop.
        try:
            urllib.request.urlopen(
                urllib.request.Request(base + "/input", data=b"not json"),
                timeout=10,
            )
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 400
        assert raised
        wait_frames(1)  # loop survived
    finally:
        _post(base + "/quit", {})
    t.join(60)
    assert not t.is_alive()
    assert holder["state"].frame_id > 0


def test_set_input_validates_payload():
    """Malformed /input payloads must be rejected in the handler thread
    (-> HTTP 400), never reach the render loop (where a bad buttons
    string or short pointer tuple would crash the whole viewer)."""
    from cudagaussianrenderer_tpu.viewer import ViewerState

    state = ViewerState()
    state.set_input({"pointer": [1, 2], "buttons": "left", "move": [0, 0, 1]})
    assert state.get_input().buttons == "left"
    for bad in (
        {"buttons": "lefty"},
        {"pointer": [1]},
        {"pointer": [1, 2, 3]},
        {"move": [1]},
        {"pointer": ["x", "y"]},
        [1, 2],
    ):
        with pytest.raises((ValueError, TypeError)):
            state.set_input(bad)
    # the last good state survives rejected payloads
    assert state.get_input().buttons == "left"
