"""Interactive browser viewer — the reference GUI analogue.

Reference: the interactive ImGui/Vulkan app — frame loop + property
editor (src/MainApp.cpp:660,1758), mouse picking of the correlation
reference point (src/Calculators/PointPicker.*), camera checkpoints
(MainApp.cpp:2045). This framework is headless-first, so the
interactive surface is a zero-dependency HTTP server (stdlib
``http.server``) plus a single-page browser client: drag to orbit,
wheel to zoom, shift+click (or the Pick toggle) to move the correlation
reference point, and a property panel for measure / field / colormap /
time step / member / renderer toggles. Every interaction re-renders
through the exact same :class:`~correrender_tpu.app.state.Scene` path
the CLI uses — one frame is one (cached-jit) XLA program on device, so
dragging the reference point re-runs the fused correlate+render
program, which is the BASELINE north-star interaction.

Concurrency: JAX dispatch and the Scene's mutable state live behind a
single lock; the client serializes its own requests (one in flight), so
the lock only guards against concurrent browsers. Only one process may
hold a tunneled TPU — run one viewer per chip.

Usage::

    python -m correrender_tpu.app.cli view --dataset data.nc \
        --measure pearson --ref 8,8,4 --port 8777

or programmatically::

    from correrender_tpu.app.viewer import serve
    serve(scene)            # blocks; ctrl-C to stop
"""

from __future__ import annotations

import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from correrender_tpu.render.camera import Camera, orbit_camera

_EPS_PHI = 0.05  # keep the orbit off the poles (up-vector degeneracy)


def _spherical_from_camera(cam: Camera):
    """(theta, phi, radius, center) matching :func:`orbit_camera`."""
    c = np.asarray(cam.look_at_point, np.float64)
    p = np.asarray(cam.position, np.float64)
    d = p - c
    r = float(np.linalg.norm(d))
    if r < 1e-9:
        return 0.0, 0.0, 0.8, tuple(c)
    phi = math.asin(max(-1.0, min(1.0, d[1] / r)))
    theta = math.atan2(d[0], d[2])
    return theta, phi, r, tuple(float(v) for v in c)


class ViewerApp:
    """Server-side state: one Scene + camera orbit + render settings.

    All mutating/rendering entry points take ``self._lock`` — the
    browser client keeps one request in flight, the lock makes
    concurrent clients safe (renders serialize; last write wins).
    """

    def __init__(self, scene, image_size=(800, 600), fast_dvr=True,
                 view: int = 0):
        self.scene = scene
        self.image_size = tuple(int(v) for v in image_size)
        self.fast_dvr = bool(fast_dvr)
        self.view = int(view)
        self.show_legend = True
        self.show_reference_points = True
        self.pick_mode = False
        theta, phi, radius, center = _spherical_from_camera(
            scene.views[self.view])
        self._theta, self._phi = theta, phi
        self._radius, self._center = radius, center
        self._lock = threading.Lock()
        self._frame_epoch = 0

    # -- camera ------------------------------------------------------------

    def _apply_camera(self):
        old = self.scene.views[self.view]
        self.scene.views[self.view] = orbit_camera(
            self._theta, self._phi, self._radius, self._center,
            fovy=old.fovy, z_near=old.z_near, z_far=old.z_far,
        )

    # -- calculator helpers --------------------------------------------------

    def _correlation_calcs(self):
        return [
            c for c in self.scene.volume_data.calculators.values()
            if hasattr(c, "set_reference_point")
        ]

    # -- rendering -----------------------------------------------------------

    def frame_png(self) -> bytes:
        from PIL import Image

        with self._lock:
            img = self.scene.render_view(
                self.view, image_size=self.image_size,
                fast_dvr=self.fast_dvr,
                show_reference_points=self.show_reference_points,
                show_legend=self.show_legend,
            )
            arr = (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(
                np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    # -- the JSON command surface ---------------------------------------------

    def info(self) -> dict:
        from correrender_tpu.ops.registry import MEASURE_IDS
        from correrender_tpu.render.tf import _COLORMAPS

        vd = self.scene.volume_data
        g = vd.grid
        calcs = self._correlation_calcs()
        return {
            "grid": {"xs": g.xs, "ys": g.ys, "zs": g.zs,
                     "ts": g.ts, "es": g.es},
            "fields": vd.field_names,
            "measures": [m.value for m in MEASURE_IDS],
            "colormaps": list(_COLORMAPS),
            "renderers": [dict(r) for r in self.scene.renderers],
            "time": self.scene.current_time,
            "member": self.scene.current_member,
            "image_size": list(self.image_size),
            "fast_dvr": self.fast_dvr,
            "legend": self.show_legend,
            "pick_mode": self.pick_mode,
            "measure": (calcs[0].measure.value if calcs else None),
            "reference_point": (list(calcs[0].reference_point)
                                if calcs else None),
            "camera": {"theta": self._theta, "phi": self._phi,
                       "radius": self._radius},
            "checkpoints": sorted(self.scene.camera_checkpoints),
            "frame_epoch": self._frame_epoch,
        }

    def api(self, cmd: dict) -> dict:
        """Dispatch one client command; returns a JSON-able reply."""
        with self._lock:
            reply = self._api_locked(dict(cmd))
        reply.setdefault("ok", True)
        return reply

    def _api_locked(self, cmd: dict) -> dict:
        op = cmd.get("op")
        scene, vd = self.scene, self.scene.volume_data
        if op == "info":
            return self.info()

        if op == "orbit":
            self._theta += float(cmd.get("dtheta", 0.0))
            self._phi = max(-math.pi / 2 + _EPS_PHI,
                            min(math.pi / 2 - _EPS_PHI,
                                self._phi + float(cmd.get("dphi", 0.0))))
            self._apply_camera()

        elif op == "zoom":
            self._radius = max(0.05, min(
                20.0, self._radius * float(cmd.get("factor", 1.0))))
            self._apply_camera()

        elif op == "pick":
            from correrender_tpu.render.picking import pick_voxel

            calcs = self._correlation_calcs()
            if not calcs:
                return {"ok": False,
                        "error": "no correlation calculator in scene"}
            g = vd.grid
            voxel = pick_voxel(
                scene.views[self.view],
                (int(cmd["px"]), int(cmd["py"])),
                self.image_size, (g.zs, g.ys, g.xs),
                g.render_box(),
                fixed_z_fraction=cmd.get("fixed_z_fraction"),
            )
            if voxel is None:
                return {"ok": False, "error": "ray misses the volume"}
            for calc in calcs:
                calc.set_reference_point(*voxel)
            self._frame_epoch += 1
            return {"reference_point": [int(v) for v in voxel]}

        elif op == "set_measure":
            from correrender_tpu.ops.registry import measure_from_id

            calcs = self._correlation_calcs()
            if not calcs:
                return {"ok": False,
                        "error": "no correlation calculator in scene"}
            measure = measure_from_id(cmd["measure"])
            for calc in calcs:
                # A default-named calculator's output field is named
                # after the measure (reference behavior: the measure
                # setting renames the output field) — rename the
                # registry entry and every renderer/TF reference, or
                # the old name keeps serving its stale cached slab.
                old = calc.output_name
                calc.measure = measure
                new = calc.output_name
                if new != old:
                    try:
                        vd.rename_field(old, new)
                    except ValueError:
                        # Name collision (a second calculator already
                        # owns the measure-derived name): pin this
                        # calculator to its current name instead.
                        calc._output_name = old
                        new = old
                    else:
                        for r in scene.renderers:
                            if r.get("field") == old:
                                r["field"] = new
                        scene.transfer_functions.pop(old, None)
                vd.mark_dirty(new)
                # The TF domain depends on the measure's value range
                # ([-1,1] vs [0,max-MI]) — drop it so tf_for re-derives.
                scene.transfer_functions.pop(new, None)

        elif op == "set_field":
            calcs = self._correlation_calcs()
            name = cmd["field"]
            if not vd.field_exists(name):
                return {"ok": False, "error": f"unknown field {name!r}"}
            if not calcs:
                return {"ok": False,
                        "error": "no correlation calculator in scene"}
            for calc in calcs:
                calc.field_name = name
                if not calc.symmetric_fields:
                    calc.field_name_ref = name
                vd.mark_dirty(calc.output_name)
                scene.transfer_functions.pop(calc.output_name, None)

        elif op == "set_colormap":
            from correrender_tpu.render.tf import TransferFunction

            calcs = self._correlation_calcs()
            targets = ([c.output_name for c in calcs]
                       or [r.get("field") for r in scene.renderers
                           if r.get("field")])
            for field in targets:
                lo, hi = vd.get_min_max(
                    field, scene.current_time, scene.current_member)
                scene.transfer_functions[field] = (
                    TransferFunction.from_colormap(
                        cmd["colormap"], domain=(lo, hi),
                        opacity_points=((0.0, 0.7), (0.5, 0.0), (1.0, 0.7))
                        if lo < 0 < hi else ((0.0, 0.0), (1.0, 0.8)),
                    ))

        elif op == "set_time":
            scene.current_time = max(0, min(vd.grid.ts - 1,
                                            int(cmd["time"])))
        elif op == "set_member":
            scene.current_member = max(0, min(vd.grid.es - 1,
                                              int(cmd["member"])))
        elif op == "set_option":
            key, value = cmd["key"], cmd["value"]
            if key == "legend":
                self.show_legend = bool(value)
            elif key == "refpoints":
                self.show_reference_points = bool(value)
            elif key == "fast_dvr":
                self.fast_dvr = bool(value)
            elif key == "pick_mode":
                self.pick_mode = bool(value)
            elif key == "image_size":
                w, h = (int(v) for v in value)
                self.image_size = (max(64, min(3840, w)),
                                   max(48, min(2160, h)))
            else:
                return {"ok": False, "error": f"unknown option {key!r}"}

        elif op == "checkpoint_save":
            scene.save_camera_checkpoint(str(cmd["name"]), self.view)
        elif op == "checkpoint_restore":
            try:
                scene.restore_camera_checkpoint(str(cmd["name"]),
                                                self.view)
            except KeyError:
                return {"ok": False,
                        "error": f"no checkpoint {cmd['name']!r}"}
            theta, phi, radius, center = _spherical_from_camera(
                scene.views[self.view])
            self._theta, self._phi = theta, phi
            self._radius, self._center = radius, center

        elif op == "save_state":
            scene.save_state(str(cmd["path"]))
            return {"path": str(cmd["path"])}

        else:
            return {"ok": False, "error": f"unknown op {op!r}"}

        self._frame_epoch += 1
        return {"frame_epoch": self._frame_epoch}


def _make_handler(app: ViewerApp):
    class Handler(BaseHTTPRequestHandler):
        # Quiet: the render log would otherwise drown in GET lines.
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path in ("/", "/index.html"):
                self._send(200, "text/html; charset=utf-8",
                           _INDEX_HTML.encode())
            elif url.path == "/frame":
                try:
                    png = app.frame_png()
                except Exception as e:  # surface render errors to the UI
                    self._send(500, "application/json",
                               json.dumps({"error": str(e)}).encode())
                    return
                self._send(200, "image/png", png)
            elif url.path == "/api":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                q.setdefault("op", "info")
                self._send(200, "application/json",
                           json.dumps(app.api(q)).encode())
            else:
                self._send(404, "text/plain", b"not found")

        def do_POST(self):  # noqa: N802
            if urlparse(self.path).path != "/api":
                self._send(404, "text/plain", b"not found")
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                cmd = json.loads(self.rfile.read(n) or b"{}")
                reply = app.api(cmd)
            except Exception as e:
                reply = {"ok": False, "error": str(e)}
            self._send(200, "application/json",
                       json.dumps(reply).encode())

    return Handler


def make_server(scene, host="127.0.0.1", port=8777, **app_kwargs):
    """Build (server, app) without blocking — used by tests."""
    app = ViewerApp(scene, **app_kwargs)
    server = ThreadingHTTPServer((host, port), _make_handler(app))
    return server, app


def serve(scene, host="127.0.0.1", port=8777, **app_kwargs):
    """Serve the viewer; blocks until interrupted."""
    server, _ = make_server(scene, host, port, **app_kwargs)
    print(f"viewer: http://{host}:{server.server_address[1]}/ "
          f"(ctrl-C to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


# ---------------------------------------------------------------------------
# The single-page client. Plain JS, no external assets (zero egress).
# Interaction model: at most ONE request in flight; drag deltas
# accumulate client-side and flush when the previous round-trip
# finishes, so the frame rate adapts to the device's render latency.
# ---------------------------------------------------------------------------

_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>correrender_tpu viewer</title>
<style>
  body { margin:0; font:13px system-ui,sans-serif; background:#14161a;
         color:#d7dae0; display:flex; height:100vh; }
  #frame { flex:1; display:flex; align-items:center; justify-content:center;
           overflow:hidden; }
  #frame img { max-width:100%; max-height:100%; cursor:grab;
               image-rendering:auto; user-select:none; }
  #panel { width:240px; padding:12px; background:#1d2026; overflow-y:auto;
           border-left:1px solid #2c2f36; }
  #panel h1 { font-size:14px; margin:0 0 10px; color:#fff; }
  .row { margin-bottom:10px; }
  .row label { display:block; margin-bottom:3px; color:#9aa0ab; }
  select, input[type=text] { width:100%; background:#14161a; color:#d7dae0;
           border:1px solid #3a3e47; border-radius:4px; padding:4px; }
  input[type=range] { width:100%; }
  button { background:#2b5ea7; color:#fff; border:0; border-radius:4px;
           padding:5px 9px; margin-right:6px; cursor:pointer; }
  button.off { background:#3a3e47; }
  #status { color:#7b818c; min-height:2.5em; white-space:pre-wrap; }
</style></head><body>
<div id="frame"><img id="img" draggable="false" alt="volume render"></div>
<div id="panel">
  <h1>correrender_tpu</h1>
  <div class="row"><label>Measure</label><select id="measure"></select></div>
  <div class="row"><label>Field</label><select id="field"></select></div>
  <div class="row"><label>Colormap</label><select id="colormap"></select></div>
  <div class="row"><label>Time step <span id="tval"></span></label>
    <input type="range" id="time" min="0" value="0"></div>
  <div class="row"><label>Member <span id="eval"></span></label>
    <input type="range" id="member" min="0" value="0"></div>
  <div class="row">
    <button id="pick" class="off">Pick ref</button>
    <button id="legend">Legend</button>
  </div>
  <div class="row"><label>Camera checkpoint</label>
    <input type="text" id="ckname" placeholder="name">
    <div style="margin-top:5px">
      <button id="cksave">Save</button>
      <select id="ckload" style="width:100px;display:inline-block">
      </select>
    </div></div>
  <div class="row"><label>Reference point</label>
    <span id="refpt">—</span></div>
  <div class="row" id="status">drag = orbit · wheel = zoom ·
shift+click = pick reference point</div>
</div>
<script>
"use strict";
const img = document.getElementById("img");
let info = null, busy = false, wantFrame = false;
let pend = {dtheta:0, dphi:0, zoom:1};
let pickMode = false;

async function api(cmd) {
  const r = await fetch("/api", {method:"POST",
    headers:{"Content-Type":"application/json"},
    body:JSON.stringify(cmd)});
  return r.json();
}
function setStatus(s) { document.getElementById("status").textContent = s; }

async function refreshFrame() {
  wantFrame = true;
  if (busy) return;
  busy = true;
  while (wantFrame || pend.dtheta || pend.dphi || pend.zoom !== 1) {
    if (pend.dtheta || pend.dphi) {
      const d = {op:"orbit", dtheta:pend.dtheta, dphi:pend.dphi};
      pend.dtheta = 0; pend.dphi = 0;
      await api(d);
    }
    if (pend.zoom !== 1) {
      const f = pend.zoom; pend.zoom = 1;
      await api({op:"zoom", factor:f});
    }
    wantFrame = false;
    const t0 = performance.now();
    const r = await fetch("/frame?t=" + Date.now());
    if (r.ok) {
      const blob = await r.blob();
      const url = URL.createObjectURL(blob);
      img.onload = () => URL.revokeObjectURL(url);
      img.src = url;
      setStatus("frame: " + (performance.now() - t0).toFixed(0) + " ms");
    } else {
      const e = await r.json().catch(() => ({error:"render failed"}));
      setStatus("render error: " + e.error);
    }
  }
  busy = false;
}

img.addEventListener("pointerdown", ev => {
  if (ev.shiftKey || pickMode) { doPick(ev); return; }
  img.setPointerCapture(ev.pointerId);
  img.style.cursor = "grabbing";
  let lx = ev.clientX, ly = ev.clientY;
  const move = e => {
    pend.dtheta += -(e.clientX - lx) * 0.01;
    pend.dphi   +=  (e.clientY - ly) * 0.01;
    lx = e.clientX; ly = e.clientY;
    refreshFrame();
  };
  const up = () => {
    img.removeEventListener("pointermove", move);
    img.removeEventListener("pointerup", up);
    img.style.cursor = "grab";
  };
  img.addEventListener("pointermove", move);
  img.addEventListener("pointerup", up);
});
img.addEventListener("wheel", ev => {
  ev.preventDefault();
  pend.zoom *= Math.pow(1.0015, ev.deltaY);
  refreshFrame();
}, {passive:false});

async function doPick(ev) {
  const r = img.getBoundingClientRect();
  const px = Math.round((ev.clientX - r.left) / r.width *
                        info.image_size[0]);
  const py = Math.round((ev.clientY - r.top) / r.height *
                        info.image_size[1]);
  const reply = await api({op:"pick", px:px, py:py});
  if (reply.ok) {
    document.getElementById("refpt").textContent =
      reply.reference_point.join(", ");
    refreshFrame();
  } else setStatus(reply.error);
}

function fillSelect(id, values, current) {
  const s = document.getElementById(id);
  s.innerHTML = "";
  for (const v of values) {
    const o = document.createElement("option");
    o.value = v; o.textContent = v;
    if (v === current) o.selected = true;
    s.appendChild(o);
  }
}

async function init() {
  info = await api({op:"info"});
  fillSelect("measure", info.measures, info.measure);
  fillSelect("field", info.fields, null);
  fillSelect("colormap", info.colormaps, "coolwarm");
  fillSelect("ckload", [""].concat(info.checkpoints), "");
  const t = document.getElementById("time"),
        e = document.getElementById("member");
  t.max = info.grid.ts - 1; e.max = info.grid.es - 1;
  t.value = info.time; e.value = info.member;
  document.getElementById("tval").textContent = info.time;
  document.getElementById("eval").textContent = info.member;
  if (info.reference_point)
    document.getElementById("refpt").textContent =
      info.reference_point.join(", ");
  document.getElementById("measure").onchange = async ev => {
    await api({op:"set_measure", measure:ev.target.value}); refreshFrame();
  };
  document.getElementById("field").onchange = async ev => {
    await api({op:"set_field", field:ev.target.value}); refreshFrame();
  };
  document.getElementById("colormap").onchange = async ev => {
    await api({op:"set_colormap", colormap:ev.target.value}); refreshFrame();
  };
  t.oninput = async ev => {
    document.getElementById("tval").textContent = ev.target.value;
    await api({op:"set_time", time:+ev.target.value}); refreshFrame();
  };
  e.oninput = async ev => {
    document.getElementById("eval").textContent = ev.target.value;
    await api({op:"set_member", member:+ev.target.value}); refreshFrame();
  };
  document.getElementById("pick").onclick = ev => {
    pickMode = !pickMode;
    ev.target.classList.toggle("off", !pickMode);
    img.style.cursor = pickMode ? "crosshair" : "grab";
  };
  document.getElementById("legend").onclick = async ev => {
    const on = ev.target.classList.toggle("off");
    await api({op:"set_option", key:"legend", value:!on}); refreshFrame();
  };
  document.getElementById("cksave").onclick = async () => {
    const name = document.getElementById("ckname").value || "default";
    await api({op:"checkpoint_save", name:name});
    const i2 = await api({op:"info"});
    fillSelect("ckload", [""].concat(i2.checkpoints), "");
  };
  document.getElementById("ckload").onchange = async ev => {
    if (!ev.target.value) return;
    await api({op:"checkpoint_restore", name:ev.target.value});
    refreshFrame();
  };
  refreshFrame();
}
init();
</script></body></html>
"""
