"""Web editor client: protocol round trip over the HTTP handler
(the MAUI-editor analog — Editor/ + Lib/DllMain.cpp surface)."""

import json

import numpy as np

from sailor_tpu.engine.editor_server import EditorServer
from sailor_tpu.engine.editor_web import EditorWebApp


def _app():
    ed = EditorServer()
    ed.initialize("content/Editor.world")
    ed.start()
    return EditorWebApp(ed), ed


def test_page_and_world_listing():
    app, ed = _app()
    status, ctype, page = app.handle("GET", "/", b"")
    assert status == 200 and b"Hierarchy" in page

    status, ctype, body = app.handle("GET", "/api/world", b"")
    assert status == 200
    doc = json.loads(body)
    assert doc["objects"], "Editor.world must list game objects"
    first = doc["objects"][0]
    assert first["instance_id"] and "position" in first["yaml"]


def test_update_object_roundtrip():
    app, ed = _app()
    _, _, body = app.handle("GET", "/api/world", b"")
    obj = json.loads(body)["objects"][0]
    iid = obj["instance_id"]
    patch = "position: [5.0, 6.0, 7.0]\n"
    status, _, resp = app.handle(
        "POST", f"/api/update?id={iid}", patch.encode()
    )
    assert status == 200 and json.loads(resp)["ok"]
    go = ed.world.find_by_instance_id(iid)
    np.testing.assert_allclose(go.position, [5.0, 6.0, 7.0])
    # unknown id -> ok: false
    _, _, resp2 = app.handle("POST", "/api/update?id=nope", b"name: x\n")
    assert not json.loads(resp2)["ok"]


def test_messages_and_frame_endpoints():
    app, ed = _app()
    status, ctype, png = app.handle("GET", "/api/frame.png", b"")
    assert status == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"
    status, _, msgs = app.handle("GET", "/api/messages", b"")
    assert status == 200 and isinstance(json.loads(msgs), list)


def test_live_http_server():
    """Full socket round trip on an ephemeral port."""
    import http.client
    import threading
    from http.server import ThreadingHTTPServer

    app, ed = _app()

    # build the same handler serve() uses, but on port 0
    class Handler(__import__("http.server", fromlist=["BaseHTTPRequestHandler"]).BaseHTTPRequestHandler):
        def _respond(self, method):
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n) if n else b""
            s, c, p = app.handle(method, self.path, body)
            self.send_response(s)
            self.send_header("Content-Type", c)
            self.send_header("Content-Length", str(len(p)))
            self.end_headers()
            self.wfile.write(p)

        def do_GET(self):
            self._respond("GET")

        def do_POST(self):
            self._respond("POST")

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/api/world")
        r = conn.getresponse()
        assert r.status == 200
        doc = json.loads(r.read())
        assert doc["objects"]
    finally:
        server.shutdown()


def test_input_endpoint_routes_to_engine():
    """/api/input feeds the InputState (GlobalInput analog)."""
    from sailor_tpu.engine import input as ik

    app, ed = _app()
    events = [
        {"type": "keydown", "code": ik.KEY_W},
        {"type": "mousemove", "x": 7, "y": 9},
        {"type": "mousedown", "button": 1},
    ]
    status, _, payload = app.handle("POST", "/api/input",
                                    json.dumps(events).encode())
    assert status == 200 and json.loads(payload)["ok"]
    inp = ed.input
    assert inp.is_key_down(ik.KEY_W)
    assert inp.is_button_down(1)
    assert inp.cursor == (7, 9)


def test_content_browser_and_previews(tmp_path):
    """Content browser lists the registry's scanned assets and serves
    per-kind previews (Editor/ViewModels AssetsViewModel analog)."""
    import imageio.v2 as imageio

    app, ed = _app()
    # seed a texture so the thumbnail path is exercised
    tex = (np.random.default_rng(0).uniform(0, 255, (32, 32, 3))).astype(
        np.uint8
    )
    import os
    os.makedirs("content/Textures", exist_ok=True)
    imageio.imwrite("content/Textures/_test_tex.png", tex)
    try:
        status, ctype, body = app.handle("GET", "/api/content", b"")
        assert status == 200
        doc = json.loads(body)
        paths = {it["path"]: it["kind"] for it in doc["items"]}
        assert any(p.endswith("DefaultRenderer.renderer") for p in paths)
        assert any(p.endswith("Editor.world") for p in paths)
        texp = [p for p in paths if p.endswith("_test_tex.png")]
        assert texp and paths[texp[0]] == "texture"

        # texture preview -> PNG bytes
        status, ctype, png = app.handle(
            "GET", f"/api/asset?path={texp[0]}", b""
        )
        assert status == 200 and ctype == "image/png"
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # text preview -> renderer YAML
        rend = [p for p in paths if p.endswith(".renderer")][0]
        status, ctype, txt = app.handle("GET", f"/api/asset?path={rend}", b"")
        assert status == 200 and b"frame" in txt

        # unknown asset -> 404
        status, _, _ = app.handle("GET", "/api/asset?path=nope.png", b"")
        assert status == 404
    finally:
        os.remove("content/Textures/_test_tex.png")
        for side in ("content/Textures/_test_tex.png.asset",):
            if os.path.exists(side):
                os.remove(side)
