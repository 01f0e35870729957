"""Interactive scene visualizer.

Rebuild of the reference's `ti.GUI` viewer (reference: visualizer.py) for a
headless TPU host: a self-contained web viewer (stdlib http.server, no
dependencies) that renders frames on the TPU and streams JPEG/PNG to the
browser. Feature parity with the reference's controls (reference:
visualizer.py:105-288):

- loads and merges multiple scene parquets, one `point_object_id` per scene
- keys 0-9 select a scene object; with an object selected, the motion keys
  move *that object* instead of the camera (implemented, like the reference,
  by moving that object's camera pose - exploiting the per-object poses of
  the rasterizer)
- W/A/S/D/Q/E translate, arrow keys (or IJKL) rotate, mouse-drag on the
  view rotates too (reference: visualizer.py:207-214)
- H hides the selected object, P shows it (invalid-mask based)
- [ / ] shrink / grow the selected object (per-object scale editing via the
  rasterizer's object_edit transform - the reference defines this projection
  variant but never exposes it, reference: GaussianPoint3D.py:193-235)
- R resets the view

Run:  python visualizer.py --parquet_path a.parquet b.parquet --port 8000
then open http://<host>:8000/.
"""

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

PAGE = """<!DOCTYPE html>
<html><head><title>taichi-3dgs-tpu viewer</title>
<style>body{background:#111;color:#ccc;font-family:monospace;text-align:center}
img{image-rendering:pixelated;border:1px solid #444;margin-top:8px}</style>
</head><body>
<div>W/A/S/D/Q/E move &middot; arrows/drag rotate &middot; 0-9 select object
 &middot; ` camera &middot; H hide &middot; P show &middot; [ ] scale
 &middot; R reset</div>
<div id="status"></div>
<img id="view" width="{W}" height="{H}"/>
<script>
let busy = false;
async function refresh() {
  if (busy) return; busy = true;
  const img = document.getElementById('view');
  img.src = '/frame.png?t=' + Date.now();
  await new Promise(r => { img.onload = r; img.onerror = r; });
  busy = false;
}
document.addEventListener('keydown', async (e) => {
  const resp = await fetch('/key?k=' + encodeURIComponent(e.key));
  document.getElementById('status').textContent = await resp.text();
  refresh();
});
// mouse-drag rotation on the view (reference: visualizer.py:207-214)
const view = document.getElementById('view');
let dragging = false, lastX = 0, lastY = 0, pending = false;
view.addEventListener('mousedown', (e) => {
  dragging = true; lastX = e.clientX; lastY = e.clientY;
  e.preventDefault();
});
document.addEventListener('mouseup', () => { dragging = false; });
document.addEventListener('mousemove', async (e) => {
  if (!dragging || pending) return;
  const dx = e.clientX - lastX, dy = e.clientY - lastY;
  if (dx === 0 && dy === 0) return;
  lastX = e.clientX; lastY = e.clientY; pending = true;
  const resp = await fetch('/drag?dx=' + dx + '&dy=' + dy);
  document.getElementById('status').textContent = await resp.text();
  pending = false;
  refresh();
});
refresh();
</script></body></html>
"""


class VisualizerState:
    def __init__(self, parquet_paths, width, height, focal):
        import jax.numpy as jnp
        from gaussian_point_render import merge_scenes
        from taichi_3d_gaussian_splatting_tpu.camera import CameraInfo
        from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
            RasterizerConfig, rasterize)

        (self.pc, self.feats, invalid, self.obj,
         self.num_objects) = merge_scenes(parquet_paths)
        self.invalid = np.asarray(invalid).copy()
        self.hidden = [False] * self.num_objects
        w = width - width % 16
        h = height - height % 16
        intr = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                        np.float32)
        self.cam = CameraInfo(camera_intrinsics=intr, camera_height=h,
                              camera_width=w)
        # scene-derived budgets from a probe at the initial pose; generous
        # headroom because the user flies the camera anywhere (the
        # rasterizer's overflow counters stay the backstop)
        from taichi_3d_gaussian_splatting_tpu.ops.capacity import (
            auto_capacity_config)
        self.raster_cfg = auto_capacity_config(
            self.pc, self.feats, invalid, self.obj,
            [(jnp.array([[0.0, 0.0, 0.0, 1.0]]), jnp.zeros((1, 3)))],
            self.cam, RasterizerConfig(rgb_only=True), headroom=3.0)
        # per-object camera pose q, t (xyzw) - reference: visualizer.py:60-76
        self.reset()
        self.selected = None  # None = camera
        self.lock = threading.Lock()

        import jax

        def render(qs, ts, invalid, scales):
            identity_q = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]]),
                                  (self.num_objects, 1))
            edit = (identity_q, scales,
                    jnp.zeros((self.num_objects, 3)))
            result = rasterize(self.pc, self.feats, invalid, self.obj,
                               qs, ts, self.cam, self.raster_cfg,
                               object_edit=edit)
            return jnp.clip(result.image, 0.0, 1.0)

        self._render = jax.jit(render)

    def reset(self):
        self.qs = np.tile(np.array([0.0, 0.0, 0.0, 1.0], np.float32),
                          (self.num_objects, 1))
        self.ts = np.zeros((self.num_objects, 3), np.float32)
        self.scales = np.ones((self.num_objects, 3), np.float32)

    def _targets(self):
        if self.selected is None:
            return list(range(self.num_objects)), 1.0
        # moving an object = moving its camera pose the opposite way
        # (reference: visualizer.py:119-268)
        return [self.selected], -1.0

    def handle_key(self, key: str) -> str:
        from taichi_3d_gaussian_splatting_tpu.ops import transforms as T
        import jax.numpy as jnp
        step = 0.1
        angle = 0.05
        moves = {"w": (0, 0, step), "s": (0, 0, -step),
                 "a": (-step, 0, 0), "d": (step, 0, 0),
                 "q": (0, -step, 0), "e": (0, step, 0)}
        rots = {"ArrowLeft": (0, -angle, 0), "ArrowRight": (0, angle, 0),
                "ArrowUp": (-angle, 0, 0), "ArrowDown": (angle, 0, 0),
                "j": (0, -angle, 0), "l": (0, angle, 0),
                "i": (-angle, 0, 0), "k": (angle, 0, 0)}
        with self.lock:
            if key == "`":
                self.selected = None
                return "controlling camera"
            if key.isdigit():
                idx = int(key)
                if idx < self.num_objects:
                    self.selected = idx
                    return f"controlling object {idx}"
                return f"no object {idx}"
            if key == "r":
                self.reset()
                return "reset"
            if key in ("h", "p") and self.selected is not None:
                self.hidden[self.selected] = key == "h"
                return ("hidden" if key == "h" else "shown") + \
                    f" object {self.selected}"
            if key in ("[", "]") and self.selected is not None:
                factor = 1.1 if key == "]" else 1.0 / 1.1
                self.scales[self.selected] *= factor
                return (f"object {self.selected} scale "
                        f"{self.scales[self.selected][0]:.2f}")
            targets, sign = self._targets()
            if key in moves:
                delta = np.array(moves[key], np.float32) * sign
                for i in targets:
                    # translate in the current camera frame
                    q = jnp.asarray(self.qs[i])[None]
                    world_delta = np.asarray(T.quaternion_rotate(
                        q, jnp.asarray(delta)[None]))[0]
                    self.ts[i] += world_delta
                return f"move {key}"
            if key in rots:
                rx, ry, _ = rots[key]
                self._apply_rotation(rx, ry, targets, sign)
                return f"rotate {key}"
        return f"ignored {key}"

    def _apply_rotation(self, rx: float, ry: float, targets, sign: float):
        """Small-angle rotation of the camera (or selected object's camera
        pose) - shared by arrow keys and mouse drag. Caller holds the lock."""
        from taichi_3d_gaussian_splatting_tpu.ops import transforms as T
        import jax.numpy as jnp
        half = np.array([rx / 2, ry / 2, 0.0])
        dq = np.array([half[0], half[1], 0.0,
                       np.sqrt(max(0.0, 1 - half @ half))],
                      np.float32) * (1.0 if sign > 0 else
                                     np.array([-1, -1, -1, 1], np.float32))
        for i in targets:
            q = np.asarray(T.quaternion_multiply(
                jnp.asarray(self.qs[i])[None],
                jnp.asarray(dq)[None]))[0]
            self.qs[i] = q / np.linalg.norm(q)

    def handle_drag(self, dx: float, dy: float) -> str:
        """Mouse-drag rotation: pixel deltas -> small pitch/yaw, like the
        reference's cursor-delta camera rotation (reference:
        visualizer.py:207-214). Dragging right yaws right, dragging down
        pitches down, matching the arrow-key directions."""
        drag_angle = 0.005  # radians per pixel
        rx = float(np.clip(dy * drag_angle, -0.3, 0.3))
        ry = float(np.clip(dx * drag_angle, -0.3, 0.3))
        with self.lock:
            targets, sign = self._targets()
            self._apply_rotation(rx, ry, targets, sign)
        who = ("camera" if self.selected is None
               else f"object {self.selected}")
        return f"drag rotate {who}"

    def frame_png(self) -> bytes:
        import jax.numpy as jnp
        import PIL.Image
        with self.lock:
            invalid = self.invalid.copy()
            for i, hidden in enumerate(self.hidden):
                if hidden:
                    invalid[np.asarray(self.obj) == i] = 1
            qs = jnp.asarray(self.qs)
            ts = jnp.asarray(self.ts)
            scales = jnp.asarray(self.scales)
        img = np.asarray(self._render(qs, ts, jnp.asarray(invalid), scales))
        buf = io.BytesIO()
        PIL.Image.fromarray((img * 255).astype(np.uint8)).save(buf, "PNG")
        return buf.getvalue()


def make_handler(state: VisualizerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_GET(self):
            if self.path.startswith("/frame.png"):
                body = state.frame_png()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/key"):
                from urllib.parse import urlparse, parse_qs
                key = parse_qs(urlparse(self.path).query).get("k", [""])[0]
                msg = state.handle_key(key)
                body = msg.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/drag"):
                from urllib.parse import urlparse, parse_qs
                qs = parse_qs(urlparse(self.path).query)
                try:
                    dx = float(qs.get("dx", ["0"])[0])
                    dy = float(qs.get("dy", ["0"])[0])
                except ValueError:
                    dx = dy = 0.0
                msg = state.handle_drag(dx, dy)
                body = msg.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                body = (PAGE.replace("{W}", str(state.cam.camera_width * 1))
                        .replace("{H}", str(state.cam.camera_height * 1))
                        .encode())
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--parquet_path", type=str, nargs="+", required=True)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--width", type=int, default=976)
    parser.add_argument("--height", type=int, default=544)
    parser.add_argument("--focal", type=float, default=581.743)
    args = parser.parse_args()
    state = VisualizerState(args.parquet_path, args.width, args.height,
                            args.focal)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state))
    print(f"viewer at http://0.0.0.0:{args.port}/")
    server.serve_forever()


if __name__ == "__main__":
    main()
