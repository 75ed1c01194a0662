"""Typed ONNX GraphProto builder.

A small expression-style builder over the dynamic protobuf classes in
``_proto``: every method appends one NodeProto and returns the (unique)
output name, so graph construction reads like the math it encodes.
Counterpart of the reference's torch.onnx trace step
(scripts/export_onnx_model.py:97-144) — here the graph is constructed
explicitly, which is what makes an ONNX artifact possible in an image with
no ``onnx``/``tf2onnx`` package.

Opset-11 notes baked into the helpers:
- ``Softmax`` uses the coerce-to-2D semantics; only last-axis softmax is
  exposed (exactly what SAM's decoder needs) so the coercion is a no-op.
- ``Unsqueeze``/``Squeeze``/``Slice``/``Reduce*`` take axes as ATTRIBUTES
  (they moved to inputs only in opset 13).
- LayerNorm/GELU do not exist as single ops; ``layer_norm``/``gelu``
  emit the canonical decompositions (ReduceMean/Sub/Mul/Sqrt/Div and
  0.5x(1+Erf(x/sqrt2))) that ORT's fusion passes re-fuse.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np

from sam_quantization_tpu.export_onnx import _proto as P

_NP_TO_ONNX = {
    np.dtype(np.float32): P.FLOAT,
    np.dtype(np.float64): P.DOUBLE,
    np.dtype(np.int64): P.INT64,
    np.dtype(np.int32): P.INT32,
    np.dtype(np.int8): P.INT8,
    np.dtype(np.uint8): P.UINT8,
    np.dtype(np.bool_): P.BOOL,
}


def tensor_proto(name: str, arr: np.ndarray):
    t = P.TensorProto()
    t.name = name
    t.dims.extend(arr.shape)
    t.data_type = _NP_TO_ONNX[arr.dtype]
    t.raw_data = np.ascontiguousarray(arr).tobytes()
    return t


def value_info(name: str, shape: Sequence[int], elem_type=P.FLOAT):
    vi = P.ValueInfoProto()
    vi.name = name
    vi.type.tensor_type.elem_type = elem_type
    for d in shape:
        vi.type.tensor_type.shape.dim.add().dim_value = int(d)
    return vi


class GraphBuilder:
    def __init__(self, name: str):
        self.name = name
        self.nodes: list = []
        self.initializers: list = []
        self.inputs: list = []
        self.outputs: list = []
        self._n = 0
        self._const_cache: dict = {}

    # -- plumbing ---------------------------------------------------------

    def _fresh(self, hint: str) -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def add_input(self, name: str, shape: Sequence[int], elem_type=P.FLOAT):
        self.inputs.append(value_info(name, shape, elem_type))
        return name

    def mark_output(self, name: str, shape: Sequence[int], elem_type=P.FLOAT):
        self.outputs.append(value_info(name, shape, elem_type))
        return name

    def init(self, arr: np.ndarray, name_hint: str = "w") -> str:
        """Add a weight/constant initializer, returning its tensor name."""
        name = self._fresh(name_hint)
        self.initializers.append(tensor_proto(name, np.asarray(arr)))
        return name

    def const(self, arr, name_hint: str = "c", dtype=None) -> str:
        """Deduplicated small constant initializer."""
        a = np.asarray(arr, dtype=dtype)
        key = (a.dtype.str, a.shape, a.tobytes())
        if key not in self._const_cache:
            self._const_cache[key] = self.init(a, name_hint)
        return self._const_cache[key]

    def node(
        self,
        op_type: str,
        inputs: Iterable[str],
        n_outputs: int = 1,
        name_hint: Optional[str] = None,
        **attrs,
    ):
        n = P.NodeProto()
        n.op_type = op_type
        n.input.extend(inputs)
        outs = [self._fresh(name_hint or op_type.lower()) for _ in range(n_outputs)]
        n.output.extend(outs)
        n.name = outs[0] + "_node"
        for k, v in attrs.items():
            a = n.attribute.add()
            a.name = k
            if isinstance(v, str):
                a.type = P.AttributeProto.STRING
                a.s = v.encode()
            elif isinstance(v, float):
                a.type = P.AttributeProto.FLOAT
                a.f = v
            elif isinstance(v, (bool, int, np.integer)):
                a.type = P.AttributeProto.INT
                a.i = int(v)
            elif isinstance(v, (list, tuple)) and all(
                isinstance(x, (int, np.integer)) for x in v
            ):
                a.type = P.AttributeProto.INTS
                a.ints.extend(int(x) for x in v)
            elif isinstance(v, (list, tuple)) and all(
                isinstance(x, float) for x in v
            ):
                a.type = P.AttributeProto.FLOATS
                a.floats.extend(v)
            else:
                raise TypeError(f"unsupported attribute {k}={v!r}")
        self.nodes.append(n)
        return outs[0] if n_outputs == 1 else outs

    # -- elementwise / math ------------------------------------------------

    def add(self, a, b):
        return self.node("Add", [a, b])

    def sub(self, a, b):
        return self.node("Sub", [a, b])

    def mul(self, a, b):
        return self.node("Mul", [a, b])

    def div(self, a, b):
        return self.node("Div", [a, b])

    def sqrt(self, a):
        return self.node("Sqrt", [a])

    def erf(self, a):
        return self.node("Erf", [a])

    def sin(self, a):
        return self.node("Sin", [a])

    def cos(self, a):
        return self.node("Cos", [a])

    def relu(self, a):
        return self.node("Relu", [a])

    def sigmoid(self, a):
        return self.node("Sigmoid", [a])

    def equal(self, a, b):
        return self.node("Equal", [a, b])

    def greater(self, a, b):
        return self.node("Greater", [a, b])

    def where(self, cond, a, b):
        return self.node("Where", [cond, a, b])

    def cast(self, a, to):
        return self.node("Cast", [a], to=int(to))

    def scalar(self, v: float) -> str:
        return self.const(np.float32(v).reshape(()), "scalar")

    def gelu(self, x):
        """erf-GELU (torch nn.GELU default; nn/functional.py gelu f32 path)."""
        inner = self.div(x, self.scalar(float(np.sqrt(2.0))))
        return self.mul(
            self.mul(x, self.scalar(0.5)),
            self.add(self.scalar(1.0), self.erf(inner)),
        )

    # -- linear algebra -----------------------------------------------------

    def matmul(self, a, b):
        return self.node("MatMul", [a, b])

    def linear(self, x, w: np.ndarray, b: Optional[np.ndarray], hint="lin"):
        """x @ w + b with (K, N) weights (nn/functional.py linear layout)."""
        y = self.node("MatMul", [x, self.init(np.asarray(w, np.float32), hint + "_w")])
        if b is not None:
            y = self.node("Add", [y, self.init(np.asarray(b, np.float32), hint + "_b")])
        return y

    def softmax_lastaxis(self, x, rank: int):
        # Opset-11 Softmax coerces to 2D around `axis`; for axis == rank-1
        # that is exactly a last-axis softmax.
        return self.node("Softmax", [x], axis=rank - 1)

    def transpose(self, x, perm):
        return self.node("Transpose", [x], perm=list(perm))

    def reshape(self, x, shape):
        return self.node(
            "Reshape", [x, self.const(np.asarray(shape, np.int64), "shape")]
        )

    def concat(self, xs, axis):
        return self.node("Concat", list(xs), axis=axis)

    def slice(self, x, starts, ends, axes):
        return self.node(
            "Slice",
            [
                x,
                self.const(np.asarray(starts, np.int64), "starts"),
                self.const(np.asarray(ends, np.int64), "ends"),
                self.const(np.asarray(axes, np.int64), "axes"),
            ],
        )

    def gather(self, x, indices, axis):
        return self.node("Gather", [x, indices], axis=axis)

    def unsqueeze(self, x, axes):
        return self.node("Unsqueeze", [x], axes=list(axes))

    def reduce_mean(self, x, axes, keepdims=True):
        return self.node("ReduceMean", [x], axes=list(axes), keepdims=int(keepdims))

    def reduce_sum(self, x, axes, keepdims=True):
        return self.node("ReduceSum", [x], axes=list(axes), keepdims=int(keepdims))

    def argmax(self, x, axis, keepdims=False):
        return self.node("ArgMax", [x], axis=axis, keepdims=int(keepdims))

    def expand(self, x, shape):
        return self.node(
            "Expand", [x, self.const(np.asarray(shape, np.int64), "shape")]
        )

    def layer_norm(self, x, w: np.ndarray, b: np.ndarray, eps: float, axis_shape=None):
        """Last-axis LayerNorm decomposition (nn/functional.py layer_norm).

        ``axis_shape``: reshape target for the scale/bias when normalizing a
        non-last axis (e.g. (1, C, 1, 1) for NCHW channel LN).
        """
        axes = [-1] if axis_shape is None else [1]
        mean = self.reduce_mean(x, axes)
        centered = self.sub(x, mean)
        var = self.reduce_mean(self.mul(centered, centered), axes)
        rstd = self.div(
            self.scalar(1.0), self.sqrt(self.add(var, self.scalar(eps)))
        )
        y = self.mul(centered, rstd)
        wv = np.asarray(w, np.float32)
        bv = np.asarray(b, np.float32)
        if axis_shape is not None:
            wv = wv.reshape(axis_shape)
            bv = bv.reshape(axis_shape)
        return self.add(
            self.mul(y, self.init(wv, "ln_w")), self.init(bv, "ln_b")
        )

    def conv(self, x, w_hwio: np.ndarray, b: Optional[np.ndarray], stride: int,
             pad: int = 0):
        """NCHW Conv from an HWIO kernel (nn/functional.py conv2d layout)."""
        w = np.ascontiguousarray(np.transpose(np.asarray(w_hwio, np.float32), (3, 2, 0, 1)))
        kh, kw = w.shape[2], w.shape[3]
        ins = [x, self.init(w, "conv_w")]
        if b is not None:
            ins.append(self.init(np.asarray(b, np.float32), "conv_b"))
        return self.node(
            "Conv", ins, kernel_shape=[kh, kw], strides=[stride, stride],
            pads=[pad, pad, pad, pad],
        )

    def conv_transpose(self, x, w_hwio: np.ndarray, b: Optional[np.ndarray], stride: int):
        """NCHW ConvTranspose from an HWIO kernel; kernel == stride, no pad
        (the only form SAM uses — mask_decoder.py output_upscaling)."""
        w = np.ascontiguousarray(np.transpose(np.asarray(w_hwio, np.float32), (2, 3, 0, 1)))
        kh, kw = w.shape[2], w.shape[3]
        ins = [x, self.init(w, "convt_w")]
        if b is not None:
            ins.append(self.init(np.asarray(b, np.float32), "convt_b"))
        return self.node(
            "ConvTranspose", ins, kernel_shape=[kh, kw],
            strides=[stride, stride], pads=[0, 0, 0, 0],
        )

    def resize_linear(self, x, scales: Sequence[float]):
        """Opset-11 Resize, linear, half_pixel (jax.image.resize 'bilinear')."""
        roi = self.const(np.zeros((0,), np.float32), "roi")
        sc = self.const(np.asarray(scales, np.float32), "scales")
        return self.node(
            "Resize", [x, roi, sc], mode="linear",
            coordinate_transformation_mode="half_pixel",
        )

    # -- assembly -----------------------------------------------------------

    def build_model(self, opset: int = 11, producer: str = "sam_quantization_tpu"):
        g = P.GraphProto()
        g.name = self.name
        g.node.extend(self.nodes)
        g.initializer.extend(self.initializers)
        g.input.extend(self.inputs)
        g.output.extend(self.outputs)
        m = P.ModelProto()
        m.ir_version = P.IR_VERSION
        m.producer_name = producer
        m.producer_version = "0.4"
        op = m.opset_import.add()
        op.domain = ""
        op.version = opset
        m.graph.CopyFrom(g)
        return m
