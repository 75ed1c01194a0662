"""Continuous-batching server test on the tiny model over the CPU mesh."""

import numpy as np
import jax

from sam_quantization_tpu.models import sam as sam_lib
from sam_quantization_tpu.models.configs import VIT_TINY
from sam_quantization_tpu.parallel import mesh as mesh_lib
from sam_quantization_tpu.parallel.serving import SamServer


def test_server_batches_requests(rng):
    model = sam_lib.init(jax.random.PRNGKey(0), VIT_TINY)
    mesh = mesh_lib.make_mesh(4, tp=1)
    server = SamServer(model, max_batch=4, max_wait_ms=50, mesh=mesh)
    server.start()
    size = VIT_TINY.image_encoder.img_size
    futs = []
    for i in range(6):
        img = rng.normal(size=(size, size, 3)).astype(np.float32) * 20 + 100
        pts = rng.uniform(10, size - 10, size=(2, 2)).astype(np.float32)
        futs.append(server.submit(img, pts, np.array([1.0, 0.0])))
    results = [f.result(timeout=300) for f in futs]
    server.stop()
    for low_res, iou in results:
        assert low_res.shape[0] == 1  # single-mask
        assert np.isfinite(low_res).all()
        assert iou.shape == (1,)
