"""Continuous image batching for the encoder→decoder serving pipeline.

SURVEY §7's serving target: "continuous batching of images across hosts for
the encoder + prompt-decoder pipeline". The reference has no serving layer
(its engines process one request at a time, script/evaluation2.py:254-271);
this module provides one, TPU-style:

  * requests (image + prompts) land in a host-side queue;
  * a dispatcher thread drains up to ``max_batch`` requests per tick, pads to
    the fixed batch, and runs ONE dp-sharded encoder program over the mesh;
  * decodes run as one batched fixed-shape program over the same batch;
  * results resolve per-request futures.

Scope: this server is single-host — one dispatcher thread, one queue, with
an optional dp sharding of the batch over a local mesh. On a multi-host
deployment each host would run its own SamServer over the global mesh's
local slice and feed it host-local requests (the GSPMD program is identical
across hosts; `data.datasets.shard_indices` is the request-sharding
counterpart) — that orchestration is NOT implemented here.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sam_quantization_tpu.models import sam as sam_lib
from sam_quantization_tpu.predictor import MAX_POINTS


@dataclasses.dataclass
class SamRequest:
    image: np.ndarray  # (S, S, 3) preprocessed-size raw image
    point_coords: np.ndarray  # (N, 2) xy in model frame
    point_labels: np.ndarray  # (N,)
    future: Future = dataclasses.field(default_factory=Future)


class SamServer:
    def __init__(
        self,
        model: sam_lib.Sam,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        mesh=None,
        multimask_output: bool = False,
    ):
        self.model = model
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.multimask = multimask_output
        self._queue: "queue.Queue[Optional[SamRequest]]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._mesh = mesh
        self._dp_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._dp_sharding = NamedSharding(mesh, P("dp"))

        size = model.config.image_encoder.img_size

        @jax.jit
        def encode(images):
            return sam_lib.encode_image(model, sam_lib.preprocess(model, images))

        @jax.jit
        def decode(emb, coords, labels):
            return sam_lib.decode_masks(
                model, emb, points=(coords, labels),
                multimask_output=self.multimask,
            )

        self._encode = encode
        self._decode = decode
        self._size = size

    # -- public API --------------------------------------------------------

    def submit(self, image, point_coords, point_labels) -> Future:
        req = SamRequest(
            image=np.asarray(image),
            point_coords=np.asarray(point_coords, np.float32),
            point_labels=np.asarray(point_labels, np.float32),
        )
        self._queue.put(req)
        return req.future

    def start(self):
        assert self._thread is None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        if self._thread is not None:
            self._queue.put(None)
            self._thread.join()
            self._thread = None

    # -- batching core -----------------------------------------------------

    def process_batch(self, requests: List[SamRequest]):
        n = len(requests)
        B = self.max_batch
        S = self._size
        images = np.zeros((B, S, S, 3), np.float32)
        coords = np.zeros((B, MAX_POINTS, 2), np.float32)
        labels = -np.ones((B, MAX_POINTS), np.float32)
        for i, r in enumerate(requests):
            h, w = r.image.shape[:2]
            images[i, :h, :w] = r.image
            k = min(len(r.point_coords), MAX_POINTS)
            coords[i, :k] = r.point_coords[:k]
            labels[i, :k] = r.point_labels[:k]
        images_j = jnp.asarray(images)
        if self._dp_sharding is not None:
            images_j = jax.device_put(images_j, self._dp_sharding)
        emb = self._encode(images_j)
        low_res, iou = self._decode(emb, jnp.asarray(coords), jnp.asarray(labels))
        low_res = np.asarray(low_res)
        iou = np.asarray(iou)
        for i, r in enumerate(requests):
            r.future.set_result((low_res[i], iou[i]))

    def _loop(self):
        while True:
            first = self._queue.get()
            if first is None:
                return
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    req = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if req is None:
                    self.process_batch(batch)
                    return
                batch.append(req)
            try:
                self.process_batch(batch)
            except Exception as e:  # pragma: no cover
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
