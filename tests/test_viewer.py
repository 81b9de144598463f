"""Endpoint-level tests for the web viewer (yuki_tpu/app/viewer.py).

The reference's window/UI is its primary interface
(yuki/src/app/window.rs:90-317); our equivalent surface is the HTTP
viewer, so every endpoint gets exercised against a real
ThreadingHTTPServer on an ephemeral port, CPU backend, tiny Cornell
renders (VERDICT r4 item 7: the viewer had zero tests).
"""

import json
import os
import threading
import time
import urllib.request

import pytest

from yuki_tpu.app.settings import InitialSettings
from yuki_tpu.app.viewer import make_server


@pytest.fixture(scope="module")
def server():
    # Empty load path -> built-in Cornell (app/util.rs:55-56 parity).
    srv = make_server(InitialSettings(), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.viewer_state.renderer.kill()
    srv.shutdown()


def _url(server, path):
    return f"http://127.0.0.1:{server.server_address[1]}{path}"


def _get(server, path):
    with urllib.request.urlopen(_url(server, path), timeout=300) as r:
        return r.status, r.read()


def _post(server, path, body=None):
    data = json.dumps(body or {}).encode()
    req = urllib.request.Request(_url(server, path), data=data, method="POST")
    # Generous: debug_ray/render compile their graphs on first call.
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, r.read()


_SMALL = {
    "integrator": "Path", "max_depth": 2, "sampler": "Uniform",
    "spp": 1, "res": "64x48", "exposure": 1.0, "tonemap": "Filmic",
}


def _render_and_wait(server, cfg=None, timeout=120.0):
    code, _ = _post(server, "/render", {**_SMALL, **(cfg or {})})
    assert code == 200
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        _, body = _get(server, "/status")
        msg = json.loads(body)
        if msg["text"].startswith("done"):
            return msg
        time.sleep(0.25)
    raise AssertionError(f"render did not finish: {msg}")


def test_index_page(server):
    code, body = _get(server, "/")
    assert code == 200
    assert b"yuki-tpu" in body
    # Camera defaults from the loaded scene are substituted in.
    assert b"%CAM_POS%" not in body


def test_render_poll_image(server):
    msg = _render_and_wait(server)
    assert "Mrays" in msg["text"]
    code, body = _get(server, "/image.png?1")
    assert code == 200
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    state = server.viewer_state
    assert state.film is not None
    assert state.film.res == (64, 48)


def test_debug_ray_projection(server):
    _render_and_wait(server)
    code, body = _post(server, "/debug_ray", {"fx": 0.5, "fy": 0.5})
    assert code == 200
    out = json.loads(body)
    assert out["res"] == [64, 48]
    segs = out["segments"]
    # Center of Cornell: the path hits the back wall — at least a
    # direct segment plus per-light shadow segments.
    assert len(segs) >= 2
    for s in segs:
        assert set(s) >= {"x0", "y0", "x1", "y1", "color"}
    # The clicked pixel's direct segment starts at the camera: its
    # projection is the film center.
    assert abs(segs[0]["x0"] - 32) < 2 and abs(segs[0]["y0"] - 24) < 2


def test_bvh_level_overlay(server):
    _render_and_wait(server)
    code, body = _get(server, "/bvh?level=1")
    assert code == 200
    out = json.loads(body)
    # Each AABB draws 12 edges.
    assert len(out["segments"]) >= 12
    assert len(out["segments"]) % 12 == 0


def test_scene_stats(server):
    code, body = _get(server, "/scene_stats")
    assert code == 200
    out = json.loads(body)
    assert "triangles: 36" in out["text"]
    assert out["split_method"] in (
        "SurfaceAreaHeuristic", "Middle", "EqualCounts"
    )


def test_save_exr_roundtrip(server, tmp_path, monkeypatch):
    _render_and_wait(server)
    monkeypatch.chdir(tmp_path)
    code, body = _post(server, "/save_exr", {"tonemapped": False})
    assert code == 200
    path = json.loads(body)["path"]
    assert path and os.path.exists(tmp_path / path)
    from yuki_tpu.app.exr import read_exr

    img = read_exr(str(tmp_path / path))
    assert img.shape == (48, 64, 3)
    assert float(img.max()) > 0.0

    code, body = _post(server, "/save_exr", {"tonemapped": True})
    tpath = json.loads(body)["path"]
    timg = read_exr(str(tmp_path / tpath))
    assert timg.shape == (48, 64, 3)
    # Tonemapped output is display-referred.
    assert float(timg.max()) <= 1.0 + 1e-6


def test_save_settings(server, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    code, _ = _post(server, "/save_settings")
    assert code == 200
    assert (tmp_path / "settings.yaml").exists()
    from yuki_tpu.app.settings import load_settings

    s = load_settings(str(tmp_path / "settings.yaml"))
    assert s is not None


def test_kill_endpoint(server):
    code, _ = _post(server, "/render", dict(_SMALL, spp=64))
    assert code == 200
    code, _ = _post(server, "/kill")
    assert code == 200
    # A fresh render still works after the kill.
    _render_and_wait(server)


def test_reload_scene_with_bvh_options(server):
    old_scene = server.viewer_state.scene
    code, _ = _post(
        server, "/reload_scene",
        {"split_method": "Middle", "max_shapes": 4},
    )
    assert code == 200
    state = server.viewer_state
    assert state.scene is not old_scene
    assert state.settings.load_settings.split_method == "Middle"
    assert state.settings.load_settings.max_shapes_in_node == 4
    _render_and_wait(server)


def test_unknown_post_404(server):
    req = urllib.request.Request(
        _url(server, "/nope"), data=b"{}", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 404
