"""Interactive SAM demo server.

Counterpart of the reference's React + onnxruntime-web demo (demo/README.md
:1-28) re-imagined for the TPU stack: the browser sends clicks to this tiny
dependency-free HTTP server, which runs the (optionally quantized) model via
:class:`SamPredictor` — embeddings cached per image exactly like the
reference's precomputed-embedding flow — and streams the mask back as raw
bytes the page composites on a canvas.

Run:  python demo/server.py --model vit_b [--checkpoint sam.pth] [--load dir]
Open: http://localhost:8000
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATE = {"predictor": None, "shape": None, "clicks": []}


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _send(self, code, body, ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        here = os.path.dirname(__file__)
        path = self.path.split("?")[0]
        if path in ("/", "/index.html"):
            with open(os.path.join(here, "index.html"), "rb") as f:
                self._send(200, f.read(), "text/html")
        elif path == "/decoder.js":
            with open(os.path.join(here, "decoder.js"), "rb") as f:
                self._send(200, f.read(), "application/javascript")
        elif path == "/decoder_manifest.json":
            self._send(200, json.dumps(STATE["manifest"]).encode())
        elif path == "/decoder_weights.bin":
            self._send(200, STATE["blob"], "application/octet-stream")
        elif path == "/embedding":
            # image embedding + transform metadata for the in-browser decoder
            # (counterpart of the reference demo's precomputed-embedding flow,
            # demo/README.md:1-28)
            pred = STATE["predictor"]
            if pred.features is None:
                self._send(400, b'{"error": "no image set"}')
                return
            emb = np.asarray(pred.features, np.float32)  # (1, h, w, C)
            body = json.dumps(
                {
                    "embedding": base64.b64encode(
                        np.ascontiguousarray(emb).tobytes()
                    ).decode(),
                    "shape": list(emb.shape),
                    "input_size": list(pred.input_size),
                    "original_size": list(pred.original_size),
                }
            ).encode()
            self._send(200, body)
        else:
            self._send(404, b"{}")

    def do_POST(self):
        try:
            self._do_post()
        except (KeyError, ValueError, TypeError) as e:
            self._send(
                400,
                json.dumps({"error": f"bad request: {e!r}"}).encode(),
            )

    def _do_post(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        if self.path == "/set_image":
            h, w = payload["height"], payload["width"]
            rgba = np.frombuffer(
                base64.b64decode(payload["rgba"]), np.uint8
            ).reshape(h, w, 4)
            image = rgba[..., :3].copy()
            STATE["predictor"].set_image(image)
            STATE["shape"] = (h, w)
            STATE["clicks"] = []
            self._send(200, b'{"ok": true}')
        elif self.path == "/click":
            STATE["clicks"].append(
                (float(payload["x"]), float(payload["y"]), int(payload["label"]))
            )
            clicks = STATE["clicks"]
            coords = np.array([[c[0], c[1]] for c in clicks], np.float32)
            labels = np.array([c[2] for c in clicks], np.float32)
            masks, ious, _ = STATE["predictor"].predict(
                point_coords=coords, point_labels=labels, multimask_output=False
            )
            mask = np.ascontiguousarray(masks[0].astype(np.uint8))
            body = json.dumps(
                {
                    "mask": base64.b64encode(mask.tobytes()).decode(),
                    "iou": float(ious[0]),
                    "height": mask.shape[0],
                    "width": mask.shape[1],
                }
            ).encode()
            self._send(200, body)
        elif self.path == "/reset":
            STATE["clicks"] = []
            self._send(200, b'{"ok": true}')
        else:
            self._send(404, b"{}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_b")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--load", default=None, help="quantized artifact dir")
    ap.add_argument("--serve-int8", action="store_true",
                    help="cached-int8 + static-act serving mode (needs a "
                    "--sym --act-scales artifact)")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU alone)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sam_quantization_tpu.models import build_sam, sam as sam_lib
    from sam_quantization_tpu.predictor import SamPredictor

    model = build_sam.sam_model_registry[args.model](checkpoint=args.checkpoint)
    if args.load:
        from sam_quantization_tpu.quant import artifacts

        enc, qcfg = artifacts.load_quantized(args.load)
        if args.serve_int8 and qcfg.get("sym"):
            from sam_quantization_tpu.models.configs import CONFIGS
            from sam_quantization_tpu.nn.packed import (
                cache_int8, default_serve_skip,
            )

            enc = cache_int8(
                enc, act_scales=qcfg.get("act_scales"),
                skip=default_serve_skip(
                    CONFIGS[args.model].image_encoder.embed_dim
                ),
            )
        model = sam_lib.Sam(
            image_encoder=enc, prompt_encoder=model.prompt_encoder,
            mask_decoder=model.mask_decoder, config=model.config,
        )
    STATE["predictor"] = SamPredictor(model)
    from sam_quantization_tpu.export_js import flatten_decoder

    STATE["manifest"], STATE["blob"] = flatten_decoder(model)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"demo at http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
