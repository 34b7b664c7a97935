"""Interactive web viewer: the headless-environment replacement for the
reference's GLUT/GLUI window (exa/viewer.cpp).

Zero-dependency: a stdlib http.server streams PNG frames to a canvas;
mouse-drag orbits the camera (InspectMode analog, glutViewer/InspectMode),
the wheel zooms, and a side panel exposes the core GLUI controls
(colormap, domain range, opacity scale, dt, iso value, space-keyed
progressive accumulation).

Run:  python -m owlexabrick_tpu.viewer.serve scene.exa --port 8000
"""

from __future__ import annotations

import io
import sys
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..io.config import parse_config
from ..render.camera import Camera
from ..render.dvr import RenderConfig
from ..render.frame import make_frame_state
from ..render.renderer import Renderer
from ..render.scene import scene_from_config
from .colormaps import COLORMAP_NAMES

_PAGE = """<!doctype html>
<html><head><title>owlexabrick-tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font:13px sans-serif;
       display:flex; }
#view { flex:1; display:flex; align-items:center; justify-content:center; }
canvas { background:#000; }
#panel { width:240px; padding:12px; background:#1b1b1b; }
#panel label { display:block; margin-top:10px; }
#panel input, #panel select { width:100%; }
#fps { color:#8c8; }
</style></head><body>
<div id="view"><canvas id="c" width="__W__" height="__H__"></canvas></div>
<div id="panel">
  <b>owlexabrick-tpu</b>
  <div id="fps">-</div>
  <label>colormap <select id="cmap">__CMAPS__</select></label>
  <label>range lo <input id="lo" type="number" step="any" value="__LO__"></label>
  <label>range hi <input id="hi" type="number" step="any" value="__HI__"></label>
  <label>opacity scale <input id="os" type="range" min="0" max="2"
    step="0.01" value="1"></label>
  <label>dt <input id="dt" type="number" step="0.05" value="__DT__"></label>
  <label>iso value (0=off) <input id="iso" type="number" step="any"
    value="0"></label>
  <div style="margin-top:12px">drag = orbit, wheel = zoom</div>
</div>
<script>
const c = document.getElementById('c'), ctx = c.getContext('2d');
let theta = __THETA__, phi = __PHI__, dist = __DIST__;
let dirty = true, frame = 0, busy = false;
const t0 = [];
function params() {
  return new URLSearchParams({
    theta, phi, dist, frame,
    cmap: document.getElementById('cmap').value,
    lo: document.getElementById('lo').value,
    hi: document.getElementById('hi').value,
    os: document.getElementById('os').value,
    dt: document.getElementById('dt').value,
    iso: document.getElementById('iso').value,
  });
}
async function tick() {
  if (busy) return;
  busy = true;
  const t = performance.now();
  const r = await fetch('/frame?' + params());
  const blob = await r.blob();
  const img = await createImageBitmap(blob);
  ctx.drawImage(img, 0, 0);
  t0.push(performance.now() - t); if (t0.length > 10) t0.shift();
  const avg = t0.reduce((a,b)=>a+b,0)/t0.length;
  document.getElementById('fps').textContent =
    (1000/avg).toFixed(1) + ' fps (' + avg.toFixed(0) + ' ms)';
  frame = dirty ? 0 : frame + 1;
  dirty = false;
  busy = false;
}
setInterval(tick, 30);
let drag = null;
c.onmousedown = e => drag = [e.clientX, e.clientY];
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  theta += (e.clientX - drag[0]) * 0.01;
  phi = Math.max(-1.5, Math.min(1.5, phi + (e.clientY - drag[1]) * 0.01));
  drag = [e.clientX, e.clientY];
  dirty = true;
};
c.onwheel = e => { dist *= Math.exp(e.deltaY * 0.001); dirty = true;
                   e.preventDefault(); };
for (const id of ['cmap','lo','hi','os','dt','iso'])
  document.getElementById(id).oninput = () => dirty = true;
</script></body></html>"""


class ViewerState:
    def __init__(self, config_path: str, width: int, height: int):
        cfg = parse_config(config_path)
        self.scene, _, _ = scene_from_config(cfg)
        self.width = width
        self.height = height
        w_lo, w_hi = cfg.world_bounds()
        self.center = 0.5 * (w_lo + w_hi)
        self.diag = float(np.linalg.norm(w_hi - w_lo))
        vr = cfg.scalar_fields[0].value_range
        self.value_range = vr
        self.lock = threading.Lock()
        self.renderer = None
        self.key = None

    def camera(self, theta, phi, dist):
        eye = self.center + dist * self.diag * np.asarray([
            np.cos(phi) * np.sin(theta),
            np.sin(phi),
            np.cos(phi) * np.cos(theta),
        ])
        return Camera.look_at(eye, self.center, [0, 1, 0], 55.0,
                              self.width, self.height)

    def render(self, q) -> bytes:
        theta = float(q.get("theta", ["0.5"])[0])
        phi = float(q.get("phi", ["0.3"])[0])
        dist = float(q.get("dist", ["1.2"])[0])
        frame = int(q.get("frame", ["0"])[0])
        cmap = q.get("cmap", ["Paraview Cool Warm"])[0]
        lo = float(q.get("lo", [str(self.value_range[0])])[0])
        hi = float(q.get("hi", [str(self.value_range[1])])[0])
        os_ = float(q.get("os", ["1"])[0])
        dt = float(q.get("dt", ["0.5"])[0])
        iso = float(q.get("iso", ["0"])[0])

        with self.lock:
            key = (cmap, lo, hi, os_, dt, iso != 0.0)
            cam = self.camera(theta, phi, dist)
            if self.renderer is None or key != self.key:
                fs = make_frame_state(
                    cam, 1, [[lo, hi]], colormap=cmap,
                    opacity_scale=os_, dt=dt,
                )
                if iso != 0.0:
                    fs.iso_enabled[0] = True
                    fs.iso_value[0] = iso
                rcfg = RenderConfig(num_channels=1,
                                    iso_surfaces=iso != 0.0)
                self.renderer = Renderer(
                    self.scene, self.width, self.height, cfg=rcfg,
                    frame_state=fs,
                )
                self.key = key
            r = self.renderer
            from ..render.frame import with_camera

            if frame == 0:
                r.fs = with_camera(r.fs, cam)
                r.reset_accumulation()
                r.enable_fast_path()
            img = r.render()
            rgba = r.image_uint8(img)

        from ..utils.png import write_png

        buf = io.BytesIO()
        write_png(buf, rgba)
        return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    state: ViewerState = None

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        url = urllib.parse.urlparse(self.path)
        if url.path == "/":
            vr = self.state.value_range
            opts = "".join(
                f'<option{" selected" if n == "Paraview Cool Warm" else ""}>'
                f"{n}</option>" for n in COLORMAP_NAMES
            )
            page = (
                _PAGE.replace("__W__", str(self.state.width))
                .replace("__H__", str(self.state.height))
                .replace("__CMAPS__", opts)
                .replace("__LO__", f"{vr[0]:g}")
                .replace("__HI__", f"{vr[1]:g}")
                .replace("__DT__", "0.5")
                .replace("__THETA__", "0.5")
                .replace("__PHI__", "0.3")
                .replace("__DIST__", "1.2")
            )
            body = page.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif url.path == "/frame":
            q = urllib.parse.parse_qs(url.query)
            try:
                data = self.state.render(q)
            except Exception as e:  # pragma: no cover
                self.send_response(500)
                msg = str(e).encode()
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        else:
            self.send_response(404)
            self.end_headers()


def main(argv=None) -> int:
    argv = list(argv if argv is not None else sys.argv[1:])
    if not argv:
        print("usage: python -m owlexabrick_tpu.viewer.serve <scene.exa> "
              "[--port N] [--size W H]")
        return 1
    config = argv[0]
    port = 8000
    size = (768, 576)
    i = 1
    while i < len(argv):
        if argv[i] == "--port":
            port = int(argv[i + 1])
            i += 2
        elif argv[i] in ("--size", "-win"):
            size = (int(argv[i + 1]), int(argv[i + 2]))
            i += 3
        else:
            i += 1

    _Handler.state = ViewerState(config, *size)
    server = ThreadingHTTPServer(("0.0.0.0", port), _Handler)
    print(f"#viewer: serving {config} on http://localhost:{port}/")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
