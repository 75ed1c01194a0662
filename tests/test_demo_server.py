"""End-to-end demo-server test: boots demo/server.py (CPU), pushes an image
over HTTP, and validates the in-browser decode path — the served weight
blob + embedding decoded by demo/decoder_ref.py (the executable spec of
decoder.js) must match the server's own ``POST /click`` decode."""

import base64
import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "demo"))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "demo", "server.py"),
         "--model", "vit_tiny", "--cpu", "--port", str(port)],
        cwd=ROOT, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    url = f"http://127.0.0.1:{port}"
    try:
        for _ in range(120):
            try:
                urllib.request.urlopen(url + "/decoder_manifest.json",
                                       timeout=5)
                break
            except Exception:
                if proc.poll() is not None:
                    raise RuntimeError("demo server died on startup")
                time.sleep(1)
        else:
            raise RuntimeError("demo server never came up")
        yield url
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def _get(url, p):
    return urllib.request.urlopen(url + p, timeout=300).read()


def _post(url, p, obj):
    req = urllib.request.Request(url + p, json.dumps(obj).encode())
    return json.loads(urllib.request.urlopen(req, timeout=600).read())


def test_browser_decode_parity_over_http(server):
    from decoder_ref import DecoderRef

    h, w = 120, 160
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 3] = 255
    yy, xx = np.mgrid[:h, :w]
    img[((yy - 60) ** 2 + (xx - 80) ** 2) < 900, :3] = [230, 150, 20]
    img[10:40, 10:40, :3] = [100, 170, 250]
    r = _post(server, "/set_image",
              {"rgba": base64.b64encode(img.tobytes()).decode(),
               "height": h, "width": w})
    assert r["ok"]

    emb_r = json.loads(_get(server, "/embedding"))
    manifest = json.loads(_get(server, "/decoder_manifest.json"))
    blob = _get(server, "/decoder_weights.bin")
    assert manifest["total_floats"] * 4 == len(blob)
    ref = DecoderRef(manifest, blob)
    emb = np.frombuffer(base64.b64decode(emb_r["embedding"]), np.float32)
    eh, ew, C = emb_r["shape"][1:]
    emb = emb.reshape(eh * ew, C)
    ih, iw = emb_r["input_size"]
    oh, ow = emb_r["original_size"]
    assert (oh, ow) == (h, w)

    js_clicks = []
    for click in [(80.0, 60.0, 1), (25.0, 25.0, 0)]:
        js_clicks.append((click[0] * iw / ow, click[1] * ih / oh, click[2]))
        low, iou_js = ref.decode(emb, js_clicks)
        srv = _post(server, "/click",
                    {"x": click[0], "y": click[1], "label": click[2]})
        sm = np.frombuffer(base64.b64decode(srv["mask"]), np.uint8).reshape(
            srv["height"], srv["width"]
        )
        # identical decoder math -> identical predicted IoU
        np.testing.assert_allclose(iou_js, srv["iou"], atol=1e-3)
        # masks agree up to the single- vs double-bilinear upsample
        # (index.html lowResToMask replicated here)
        S4 = low.shape[0]
        img_size = manifest["config"]["img_size"]
        sx, sy = iw * S4 / img_size / ow, ih * S4 / img_size / oh
        ys = np.clip((np.arange(oh) + 0.5) * sy - 0.5, 0, S4 - 1)
        xs = np.clip((np.arange(ow) + 0.5) * sx - 0.5, 0, S4 - 1)
        y0 = ys.astype(int)
        y1 = np.minimum(y0 + 1, S4 - 1)
        wy = (ys - y0)[:, None]
        x0 = xs.astype(int)
        x1 = np.minimum(x0 + 1, S4 - 1)
        wx = (xs - x0)[None, :]
        v = ((1 - wy) * ((1 - wx) * low[np.ix_(y0, x0)]
                         + wx * low[np.ix_(y0, x1)])
             + wy * ((1 - wx) * low[np.ix_(y1, x0)]
                     + wx * low[np.ix_(y1, x1)]))
        jm = (v > 0).astype(np.uint8)
        inter = int((jm & sm).sum())
        union = int((jm | sm).sum())
        assert union == 0 or inter / union > 0.95, inter / union

    _post(server, "/reset", {})
