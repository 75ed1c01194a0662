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

Two servers:

  * :class:`SamServer` — single-host: one dispatcher thread, one queue, with
    an optional dp sharding of the batch over a local mesh.
  * :class:`MultiHostSamServer` — the pod deployment: every process runs one
    over the SAME global mesh and drives it in lockstep ticks (the SPMD
    serving model — the jitted program is identical on every host, only the
    host-local request slices differ). Tested by a real 2-process run in
    tests/test_multiprocess.py.
"""

from __future__ import annotations

import dataclasses
import functools
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


def _pack_requests(requests: List[SamRequest], batch: int, size: int):
    """Pad a request list into fixed-shape (images, coords, labels) arrays.
    Unused point slots carry label -1 (the prompt encoder's pad code)."""
    images = np.zeros((batch, size, size, 3), np.float32)
    coords = np.zeros((batch, MAX_POINTS, 2), np.float32)
    labels = -np.ones((batch, MAX_POINTS), np.float32)
    for i, r in enumerate(requests):
        h, w = r.image.shape[:2]
        images[i, :h, :w] = r.image
        k = min(len(r.point_coords), MAX_POINTS)
        coords[i, :k] = r.point_coords[:k]
        labels[i, :k] = r.point_labels[:k]
    return images, coords, labels


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

        from sam_quantization_tpu.ops.flash_attention import scoped_jit as _jit

        @_jit
        def encode(images):
            return sam_lib.encode_image(model, sam_lib.preprocess(model, images))

        @_jit
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
        images, coords, labels = _pack_requests(
            requests, self.max_batch, self._size
        )
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


class MultiHostSamServer:
    """Continuous batching of images ACROSS HOSTS (SURVEY §7's serving
    target), as it runs on a real pod: every process constructs one of these
    over the same global mesh and calls :meth:`tick` at the same rate —
    lockstep SPMD serving.

    Per tick, each host drains up to ``per_host_batch`` requests from its
    local queue; the padded host slices assemble into ONE global dp-sharded
    batch (``jax.make_array_from_process_local_data`` — every transfer is
    host-local), one GSPMD encoder→decoder program runs over the mesh (XLA
    inserts the ICI/DCN collectives), and each host resolves its own
    futures from its addressable output shards. A one-scalar allgather lets
    all hosts skip empty ticks collectively, so an idle pod burns no encoder
    FLOPs while staying in lockstep.
    """

    def __init__(
        self,
        model: sam_lib.Sam,
        mesh,
        per_host_batch: int = 4,
        multimask_output: bool = False,
    ):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.model = model
        self.mesh = mesh
        self.per_host = per_host_batch
        self._queue: "queue.Queue[SamRequest]" = queue.Queue()
        self._size = model.config.image_encoder.img_size
        self._in_sharding = NamedSharding(mesh, P("dp"))
        self._global_batch = per_host_batch * jax.process_count()
        dp = mesh.shape["dp"]
        assert self._global_batch % dp == 0, (
            f"global batch {self._global_batch} must divide over dp={dp}"
        )

        from sam_quantization_tpu.ops.flash_attention import scoped_jit

        @functools.partial(
            scoped_jit, out_shardings=NamedSharding(mesh, P("dp"))
        )
        def run(images, coords, labels):
            emb = sam_lib.encode_image(
                model, sam_lib.preprocess(model, images)
            )
            return sam_lib.decode_masks(
                model, emb, points=(coords, labels),
                multimask_output=multimask_output,
            )

        self._run = run

    def submit(self, image, point_coords, point_labels) -> Future:
        req = SamRequest(
            image=np.asarray(image),
            point_coords=np.asarray(point_coords, np.float32),
            point_labels=np.asarray(point_labels, np.float32),
        )
        self._queue.put(req)
        return req.future

    def pending(self) -> int:
        return self._queue.qsize()

    def _host_rows(self, garr) -> np.ndarray:
        """This host's batch rows of a P('dp')-sharded global output,
        reassembled from addressable shards (tp-replicated copies deduped
        by batch offset)."""
        seen = {}
        for s in garr.addressable_shards:
            start = s.index[0].start or 0
            if start not in seen:
                seen[start] = np.asarray(s.data)
        return np.concatenate([seen[k] for k in sorted(seen)], axis=0)

    def tick(self) -> int:
        """One collective serving step; every process must call in lockstep.
        Returns the number of host-local requests served this tick."""
        from jax.experimental import multihost_utils

        batch: List[SamRequest] = []
        while len(batch) < self.per_host:
            try:
                batch.append(self._queue.get_nowait())
            except queue.Empty:
                break
        total = int(
            np.sum(multihost_utils.process_allgather(np.int32(len(batch))))
        )
        if total == 0:
            return 0
        images, coords, labels = _pack_requests(
            batch, self.per_host, self._size
        )
        to_global = functools.partial(
            jax.make_array_from_process_local_data, self._in_sharding
        )
        try:
            low_res, iou = self._run(
                to_global(images), to_global(coords), to_global(labels)
            )
            low_np = self._host_rows(low_res)
            iou_np = self._host_rows(iou)
            for i, r in enumerate(batch):
                r.future.set_result((low_np[i], iou_np[i]))
        except Exception as e:  # pragma: no cover
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)
        return len(batch)
