"""Interactive poke GUI (reference: testing/gui.py PyQt5 app) as a
zero-dependency web app: the browser canvas replaces the Qt widget, the
model-facing API is the same InteractiveSession the scripted CLI uses
(mouse drag -> poke tensor -> flow reverse -> decoded video animated
in-place, testing/gui.py:120-150, 326-376).

    python -m ipoke_tpu.eval.gui -c <cfg> -m <name> [--port 8765]

Endpoints: GET / (page), GET /frame (start frame PNG), GET /example?i=N
(switch test example), POST /poke {"pokes":[{x,y,dx,dy}...], "length": T}
-> {"frames": [dataURL...]}.
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

PAGE = """<!doctype html>
<html><head><title>ipoke-tpu interactive</title><style>
body { font-family: sans-serif; background: #111; color: #ddd; margin: 2em; }
canvas { border: 1px solid #555; image-rendering: pixelated; }
#row { display: flex; gap: 2em; }
.col { text-align: center; }
#status { margin-top: 1em; color: #8c8; }
</style></head><body>
<h2>ipoke-tpu &mdash; poke a still image</h2>
<div id="row">
  <div class="col"><div>drag to poke</div><canvas id="src" width="256" height="256"></canvas></div>
  <div class="col"><div>generated</div><canvas id="dst" width="256" height="256"></canvas></div>
</div>
<div>length <input id="len" type="number" value="9" min="1" max="60" style="width:4em">
 example <input id="ex" type="number" value="0" min="0" style="width:4em">
 <button onclick="loadExample()">load</button></div>
<div id="status">ready</div>
<script>
const src = document.getElementById('src'), dst = document.getElementById('dst');
const sctx = src.getContext('2d'), dctx = dst.getContext('2d');
let frameImg = new Image(), drag = null, frames = [], fi = 0;
frameImg.onload = () => sctx.drawImage(frameImg, 0, 0, 256, 256);
function refresh() { frameImg.src = '/frame?ts=' + Date.now(); }
refresh();
src.onmousedown = e => { const r = src.getBoundingClientRect();
  drag = {x: e.clientX - r.left, y: e.clientY - r.top}; };
src.onmousemove = e => { if (!drag) return;
  const r = src.getBoundingClientRect();
  sctx.drawImage(frameImg, 0, 0, 256, 256);
  sctx.strokeStyle = '#f55'; sctx.lineWidth = 2; sctx.beginPath();
  sctx.moveTo(drag.x, drag.y);
  sctx.lineTo(e.clientX - r.left, e.clientY - r.top); sctx.stroke(); };
src.onmouseup = async e => { if (!drag) return;
  const r = src.getBoundingClientRect();
  const poke = {x: drag.x, y: drag.y,
                dx: (e.clientX - r.left) - drag.x, dy: (e.clientY - r.top) - drag.y};
  drag = null;
  document.getElementById('status').textContent = 'generating...';
  const resp = await fetch('/poke', {method: 'POST',
    body: JSON.stringify({pokes: [poke], length: +document.getElementById('len').value})});
  const data = await resp.json();
  frames = data.frames.map(u => { const im = new Image(); im.src = u; return im; });
  document.getElementById('status').textContent =
    'generated ' + frames.length + ' frames in ' + data.seconds.toFixed(2) + 's';
};
async function loadExample() {
  await fetch('/example?i=' + document.getElementById('ex').value);
  refresh();
}
setInterval(() => { if (frames.length) {
  dctx.drawImage(frames[fi % frames.length], 0, 0, 256, 256); fi++; } }, 120);
</script></body></html>
"""


def _png_data_url(frame_m11):
    from PIL import Image

    arr = np.clip((np.asarray(frame_m11) + 1.0) * 127.5, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def make_handler(session, examples):
    """session: eval.interactive.InteractiveSession; examples: callable
    idx -> start frame (H,W,3) in [-1,1]."""
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, body, ctype="text/html"):
            data = body.encode() if isinstance(body, str) else body
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path.startswith("/frame"):
                from PIL import Image

                arr = np.clip((session.image + 1.0) * 127.5, 0, 255).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).resize((session.display_size,) * 2,
                                            Image.NEAREST).save(buf, format="PNG")
                self._send(buf.getvalue(), "image/png")
            elif self.path.startswith("/example"):
                idx = int(self.path.split("=")[-1]) if "=" in self.path else 0
                with lock:
                    session.set_image(examples(idx))
                self._send(json.dumps({"ok": True}), "application/json")
            else:
                self._send(PAGE)

        def do_POST(self):
            import time as _time
            import traceback

            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                t0 = _time.time()
                with lock:
                    vid, _ = session.generate(req.get("pokes", []),
                                              length=req.get("length"))
                clip = np.concatenate([session.image[None], vid], 0)
                frames = [_png_data_url(f) for f in clip]
                self._send(json.dumps({"frames": frames,
                                       "seconds": _time.time() - t0}),
                           "application/json")
            except Exception as e:  # report instead of dropping the connection
                body = json.dumps({"error": str(e),
                                   "trace": traceback.format_exc()[-800:]})
                data = body.encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

    return Handler


def serve(session, examples, port=8765):
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(session, examples))
    print(f"ipoke-tpu GUI: http://127.0.0.1:{port}", flush=True)
    server.serve_forever()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="configs/second_stage.yaml")
    ap.add_argument("-m", "--model_name", required=True)
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--example", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); this session's "
                         "sitecustomize overrides JAX_PLATFORMS, so the env "
                         "var alone is not enough (NOTES.md)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ipoke_tpu.config import load_parameters
    from ipoke_tpu.eval.interactive import InteractiveSession
    from ipoke_tpu.experiments.second_stage import SecondStageExperiment

    config, dirs = load_parameters(args.config, args.model_name, test_mode="samples")
    exp = SecondStageExperiment(config, dirs)
    params = exp._load_for_test()
    ui = config.get("ui", {})
    sess = InteractiveSession(params, exp.spec,
                              display_size=int(ui.get("display_size", 256)),
                              fixed_seed=bool(ui.get("fixed_seed", False)))
    exp.datamod.setup()
    ds = exp.datamod.datasets["test"]

    def examples(i):
        return ds[i % len(ds)]["images"][0]

    sess.set_image(examples(args.example))
    serve(sess, examples, port=args.port)


if __name__ == "__main__":
    main()
