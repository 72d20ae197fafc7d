"""Progressive render preview — the mtsgui role, browser-native.

The reference ships a Qt GUI (src/mtsgui) whose core loop is a
progressively refining render view.  A desktop GUI makes no sense for
a TPU pod; instead this serves the same progressive loop over HTTP:

    python -m mitsuba_tpu.preview scenes/cbox.xml --port 8731

renders pass after pass (doubling sample budgets), keeps a running
average, and serves a self-refreshing page with the current image,
spp count, and per-pass timing.  Ctrl-C stops; the latest image stays
on disk next to the scene (.preview.png).

The renderer loop is importable (`progressive_render`) and runs
headless for testing.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import threading
import time

import numpy as np


def _tonemap(img):
    return np.clip(np.asarray(img) ** (1.0 / 2.2), 0.0, 1.0)


def progressive_render(scene_path, spp_chunk=4, max_spp=0, on_pass=None,
                       defaults=None):
    """Yield (accumulated_img, total_spp, pass_seconds) after each
    pass.  max_spp = 0 renders forever (caller breaks)."""
    import mitsuba_tpu

    scene = mitsuba_tpu.load_scene(scene_path, defaults=defaults)
    acc = None
    total = 0
    seed = 0
    while max_spp <= 0 or total < max_spp:
        t0 = time.time()
        img = np.asarray(
            mitsuba_tpu.render(scene, spp=spp_chunk, seed=seed)
        )
        dt = time.time() - t0
        acc = (
            img
            if acc is None
            else (acc * total + img * spp_chunk) / (total + spp_chunk)
        )
        total += spp_chunk
        seed += 1
        if on_pass is not None:
            on_pass(acc, total, dt)
        yield acc, total, dt


def _serve(state, port):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.startswith("/img"):
                png = state.get("png")
                if png is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(png)
                return
            body = f"""<!doctype html><html><head>
<title>mitsuba_tpu preview</title>
<style>body{{background:#111;color:#ccc;font-family:monospace;
text-align:center}}img{{image-rendering:pixelated;max-width:95vw;
max-height:85vh}}</style></head><body>
<h3>{state.get('scene', '')} — {state.get('spp', 0)} spp
({state.get('dt', 0.0):.2f}s/pass)</h3>
<img src="/img?t={time.time()}">
<script>setTimeout(()=>location.reload(), 2000)</script>
</body></html>""".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="python -m mitsuba_tpu.preview",
        description="progressive render preview over HTTP",
    )
    p.add_argument("scene")
    p.add_argument("--port", type=int, default=8731)
    p.add_argument("--spp-chunk", type=int, default=4)
    p.add_argument("--max-spp", type=int, default=0)
    p.add_argument("-D", action="append", default=[], metavar="k=v",
                   help="scene parameter substitution")
    args = p.parse_args(argv)
    defaults = dict(kv.split("=", 1) for kv in args.D)

    from mitsuba_tpu.io.images import write_image

    out_png = os.path.splitext(args.scene)[0] + ".preview.png"
    state = {"scene": os.path.basename(args.scene)}
    _serve(state, args.port)
    print(f"preview at http://localhost:{args.port}  (ctrl-c stops)")

    try:
        for acc, total, dt in progressive_render(
            args.scene, args.spp_chunk, args.max_spp, defaults=defaults
        ):
            tone = _tonemap(acc)
            write_image(out_png, tone)
            with open(out_png, "rb") as f:
                state["png"] = f.read()
            state["spp"] = total
            state["dt"] = dt
            print(f"\r{total} spp ({dt:.2f}s/pass)", end="", flush=True)
    except KeyboardInterrupt:
        pass
    print(f"\nsaved {out_png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
