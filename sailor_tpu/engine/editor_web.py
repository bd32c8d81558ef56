"""Web editor client — the minimal UI analog of the reference's 6,878-LoC
.NET MAUI editor (Editor/), speaking the same protocol surface the MAUI app
P/Invokes (Lib/DllMain.cpp): SerializeCurrentWorld -> hierarchy/inspector,
UpdateObject -> live YAML property patching, GetMessages -> console,
plus a rendered-viewport image (CopyTextureToRam readback analog).

Run: ``python -m sailor_tpu.engine.editor_web --world content/Editor.world``
then open http://localhost:8787. The engine ticks on a background thread;
the page polls the frame PNG + console and POSTs YAML patches.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from sailor_tpu.engine.editor_server import EditorServer
from sailor_tpu.utils.png import encode_png, srgb_to_u8

_PAGE = """<!doctype html>
<html><head><title>sailor-tpu editor</title><style>
body{font-family:monospace;background:#1b1d22;color:#cfd2d8;margin:0;display:flex;height:100vh}
#left{width:330px;padding:10px;overflow:auto;border-right:1px solid #333}
#mid{flex:1;padding:10px;display:flex;flex-direction:column}
#viewport{image-rendering:pixelated;border:1px solid #333;max-width:100%}
textarea{width:100%;height:220px;background:#14161a;color:#cfd2d8;border:1px solid #333}
#console{height:140px;overflow:auto;background:#14161a;border:1px solid #333;padding:4px;font-size:11px;white-space:pre}
button{background:#2d6cdf;color:#fff;border:0;padding:6px 12px;margin:4px 0;cursor:pointer}
.obj{cursor:pointer;padding:2px 4px}.obj:hover{background:#2a2d34}.sel{background:#2d6cdf33}
h3{margin:6px 0;color:#8ab4ff}</style></head><body>
<div id=left><h3>Hierarchy</h3><div id=tree></div>
<h3>Content</h3><div id=content></div>
<img id=preview style="max-width:300px;display:none;border:1px solid #333"></div>
<div id=mid>
  <img id=viewport src=/api/frame.png>
  <h3>Inspector <span id=selname></span></h3>
  <textarea id=yaml></textarea>
  <button onclick=apply()>Apply (UpdateObject)</button>
  <h3>Console</h3><div id=console></div>
</div>
<script>
let sel=null, objs=[];
async function refreshWorld(){
  const w = await (await fetch('/api/world')).json();
  objs = w.objects||[];
  const t = document.getElementById('tree'); t.innerHTML='';
  for(const o of objs){
    const d=document.createElement('div');
    d.className='obj'+(sel===o.instance_id?' sel':'');
    d.textContent=o.name+'  ['+o.instance_id+']';
    d.onclick=()=>{sel=o.instance_id;
      document.getElementById('selname').textContent=o.name;
      document.getElementById('yaml').value=o.yaml; refreshWorld();};
    t.appendChild(d);
  }
}
async function apply(){
  if(!sel) return;
  await fetch('/api/update?id='+encodeURIComponent(sel),
    {method:'POST', body:document.getElementById('yaml').value});
  refreshWorld();
}
async function poll(){
  document.getElementById('viewport').src='/api/frame.png?t='+Date.now();
  const m = await (await fetch('/api/messages')).json();
  const c=document.getElementById('console');
  c.textContent=m.join('\\n'); c.scrollTop=c.scrollHeight;
}
let evq=[];
function pushEv(e){evq.push(e); if(evq.length>32) flushEv();}
async function flushEv(){ if(!evq.length) return;
  const b=JSON.stringify(evq); evq=[];
  fetch('/api/input', {method:'POST', body:b}); }
const vp=document.getElementById('viewport');
window.addEventListener('keydown',e=>pushEv({type:'keydown',code:e.keyCode}));
window.addEventListener('keyup',e=>pushEv({type:'keyup',code:e.keyCode}));
vp.addEventListener('mousedown',e=>pushEv({type:'mousedown',button:e.button}));
vp.addEventListener('mouseup',e=>pushEv({type:'mouseup',button:e.button}));
vp.addEventListener('mousemove',e=>pushEv({type:'mousemove',x:e.offsetX,y:e.offsetY}));
vp.addEventListener('contextmenu',e=>e.preventDefault());
async function refreshContent(){
  const c = await (await fetch('/api/content')).json();
  const t = document.getElementById('content'); t.innerHTML='';
  for(const it of c.items||[]){
    const d=document.createElement('div'); d.className='obj';
    d.textContent='['+it.kind[0]+'] '+it.path;
    d.onclick=()=>previewAsset(it); t.appendChild(d);
  }
}
async function previewAsset(it){
  const img=document.getElementById('preview');
  document.getElementById('selname').textContent=it.path;
  if(it.kind==='texture'){
    img.src='/api/asset?path='+encodeURIComponent(it.path)+'&t='+Date.now();
    img.style.display='block'; return;
  }
  img.style.display='none';
  const r = await fetch('/api/asset?path='+encodeURIComponent(it.path));
  const txt = await r.text();
  document.getElementById('yaml').value = txt;
}
setInterval(flushEv, 100);
refreshWorld(); refreshContent();
setInterval(poll, 500); setInterval(refreshWorld, 3000);
</script></body></html>"""


class EditorWebApp:
    """HTTP wrapper over EditorServer + a background render loop."""

    def __init__(self, editor: EditorServer, tick_hz: float = 10.0):
        self.editor = editor
        self.tick_hz = tick_hz
        self._frame_png: bytes = encode_png(
            np.zeros((8, 8, 3), np.uint8)
        )
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- engine loop -----------------------------------------------------------

    def _loop(self):
        import time

        dt = 1.0 / self.tick_hz
        while not self._stop.is_set():
            t0 = time.perf_counter()
            try:
                targets = self.editor.tick(dt)
                if targets is not None and "Final" in targets:
                    png = encode_png(srgb_to_u8(targets["Final"]))
                    with self._lock:
                        self._frame_png = png
            except Exception as e:  # keep serving the UI on engine errors
                from sailor_tpu.utils.log import SAILOR_LOG

                SAILOR_LOG("EditorWeb: tick failed: %s", e)
            left = dt - (time.perf_counter() - t0)
            if left > 0:
                self._stop.wait(left)

    def start_loop(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop_loop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    # -- request handling (framework-free) ---------------------------------------

    def handle(self, method: str, path: str, body: bytes):
        """Returns (status, content_type, payload). Pure function of the
        protocol — the HTTP layer and tests both call this."""
        url = urlparse(path)
        if method == "GET" and url.path == "/":
            return 200, "text/html", _PAGE.encode()
        if method == "GET" and url.path == "/api/world":
            objs = []
            w = self.editor.world
            if w is not None:
                import yaml as _yaml

                for go in w.game_objects:
                    doc = {
                        "name": go.name,
                        "position": go.position.tolist(),
                        "rotation": go.rotation.tolist(),
                        "scale": go.scale.tolist(),
                        "components": [c.serialize() for c in go.components],
                    }
                    objs.append({
                        "name": go.name,
                        "instance_id": go.instance_id,
                        "yaml": _yaml.safe_dump(doc, sort_keys=False),
                    })
            return 200, "application/json", json.dumps(
                {"name": w.name if w else "", "objects": objs}
            ).encode()
        if method == "GET" and url.path == "/api/frame.png":
            with self._lock:
                return 200, "image/png", self._frame_png
        if method == "GET" and url.path == "/api/messages":
            return 200, "application/json", json.dumps(
                self.editor.get_messages(64)
            ).encode()
        if method == "POST" and url.path == "/api/input":
            # route frontend key/mouse events into the GlobalInput analog
            inp = getattr(self.editor, "input", None)
            if inp is not None:
                for ev in json.loads(body.decode() or "[]"):
                    t = ev.get("type")
                    if t == "keydown":
                        inp.key_down(int(ev.get("code", -1)))
                    elif t == "keyup":
                        inp.key_up(int(ev.get("code", -1)))
                    elif t == "mousedown":
                        inp.button_down(int(ev.get("button", 0)))
                    elif t == "mouseup":
                        inp.button_up(int(ev.get("button", 0)))
                    elif t == "mousemove":
                        inp.move_cursor(ev.get("x", 0), ev.get("y", 0))
            return 200, "application/json", json.dumps(
                {"ok": inp is not None}
            ).encode()
        if method == "POST" and url.path == "/api/update":
            q = parse_qs(url.query)
            iid = (q.get("id") or [""])[0]
            ok = self.editor.update_object(iid, body.decode())
            return 200, "application/json", json.dumps({"ok": ok}).encode()
        if method == "POST" and url.path == "/api/asset/update":
            # inspector asset editing: patch a .mat (or any YAML asset) and
            # hot-reload it so the viewport reflects the edit next frame
            q = parse_qs(url.query)
            rel = (q.get("path") or [""])[0]
            ok = self.editor.update_asset(
                rel, body.decode(), registry=self._registry()
            )
            return 200, "application/json", json.dumps({"ok": ok}).encode()
        if method == "GET" and url.path == "/api/content":
            # content browser (Editor/ViewModels AssetsViewModel analog):
            # the AssetRegistry's scanned files with ids + kinds
            reg = self._registry()
            items = []
            if reg is not None:
                for path, info in sorted(reg.infos.items()):
                    items.append({
                        "path": path,
                        "file_id": info.file_id,
                        "kind": _asset_kind(path),
                    })
            return 200, "application/json", json.dumps(
                {"root": getattr(reg, "content_root", ""), "items": items}
            ).encode()
        if method == "GET" and url.path == "/api/asset":
            q = parse_qs(url.query)
            rel = (q.get("path") or [""])[0]
            reg = self._registry()
            if reg is None or rel not in getattr(reg, "infos", {}):
                return 404, "text/plain", b"unknown asset"
            return self._asset_preview(reg, rel)
        return 404, "text/plain", b"not found"

    def _registry(self):
        reg = getattr(self.editor, "registry", None)
        if reg is None:
            from sailor_tpu.assets.registry import AssetRegistry

            reg = AssetRegistry("content")
            try:
                reg.scan_content_folder()
            except Exception:
                pass
            self.editor.registry = reg
        return reg

    def _asset_preview(self, reg, rel):
        """Per-kind preview payload (texture thumbnail / text / summary)."""
        full = rel  # registry paths already include the content root
        kind = _asset_kind(rel)
        if kind == "texture":
            try:
                import imageio.v2 as imageio

                img = np.asarray(imageio.imread(full))
                if img.ndim == 2:
                    img = np.stack([img] * 3, -1)
                img = img[..., :3]
                s = max(1, max(img.shape[:2]) // 256)
                thumb = np.ascontiguousarray(img[::s, ::s]).astype(np.uint8)
                return 200, "image/png", encode_png(thumb)
            except Exception as e:
                return 500, "text/plain", str(e).encode()
        if kind == "model":
            try:
                from sailor_tpu.assets import gltf as _g

                g = _g.GLTF.load(full)
                mats = g.materials()
                soup = None
                prims = sum(
                    len(m.get("primitives", []))
                    for m in g.doc.get("meshes", [])
                )
                summary = {
                    "meshes": len(g.doc.get("meshes", [])),
                    "primitives": prims,
                    "materials": len(g.doc.get("materials", [])),
                    "images": len(g.doc.get("images", [])),
                    "material_names": [
                        m.get("name", f"mat{i}")
                        for i, m in enumerate(g.doc.get("materials", []))
                    ],
                    "queues": mats["queue"].tolist(),
                }
                return 200, "application/json", json.dumps(summary).encode()
            except Exception as e:
                return 500, "text/plain", str(e).encode()
        # text-like assets: .mat/.renderer/.world/.prefab/.shader/...
        try:
            with open(full, "rb") as f:
                data = f.read(65536)
            return 200, "text/plain", data
        except Exception as e:
            return 500, "text/plain", str(e).encode()

    def serve(self, port: int = 8787):
        app = self

        class Handler(BaseHTTPRequestHandler):
            def _respond(self, method):
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n) if n else b""
                status, ctype, payload = app.handle(method, self.path, body)
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):
                self._respond("GET")

            def do_POST(self):
                self._respond("POST")

            def log_message(self, *a):  # quiet
                pass

        server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.start_loop()
        try:
            server.serve_forever()
        finally:
            self.stop_loop()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--world", default="content/Editor.world")
    ap.add_argument("--renderer", default="content/DefaultRenderer.renderer")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sailor_tpu.engine.app import Renderer
    from sailor_tpu.kernels.sky import SkyParams

    editor = EditorServer()
    editor.initialize(args.world)
    renderer = Renderer(
        args.renderer, args.width, args.height,
        config={"bin_capacity": 512, "bin_rounds": 2,
                "shadow_resolution": 512, "env_resolution": 32},
    )
    editor.start(renderer, sky=SkyParams.default())
    app = EditorWebApp(editor)
    print(f"sailor-tpu editor: http://localhost:{args.port}")
    app.serve(args.port)


if __name__ == "__main__":
    main()


_KIND_EXT = {
    "texture": (".png", ".jpg", ".jpeg", ".bmp", ".tga", ".gif", ".hdr",
                ".exr"),
    "model": (".gltf", ".glb"),
    "material": (".mat",),
    "framegraph": (".renderer",),
    "world": (".world",),
    "prefab": (".prefab",),
}


def _asset_kind(path: str) -> str:
    import os as _os

    ext = _os.path.splitext(path)[1].lower()
    for kind, exts in _KIND_EXT.items():
        if ext in exts:
            return kind
    return "file"
