"""ONNX protobuf message classes, built at import time from the committed
descriptor — no ``onnx`` package, no protoc-generated code.

``onnx_descriptor.binpb`` is a FileDescriptorSet of the upstream
``onnx/onnx-ml.proto`` schema (see tools/extract_onnx_schema.py for
provenance and the regeneration/verification story); messages are
instantiated dynamically through the ``google.protobuf`` runtime that the
image already ships (TF dependency). Artifacts serialized through these
classes are byte-compatible with stock onnx/onnxruntime/netron.
"""

from __future__ import annotations

import os

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

_DESCRIPTOR_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "onnx_descriptor.binpb"
)

_pool = descriptor_pool.DescriptorPool()
with open(_DESCRIPTOR_PATH, "rb") as _f:
    _fds = descriptor_pb2.FileDescriptorSet()
    _fds.ParseFromString(_f.read())
for _fd in _fds.file:
    _pool.Add(_fd)


def _cls(name: str):
    return message_factory.GetMessageClass(_pool.FindMessageTypeByName(name))


ModelProto = _cls("onnx.ModelProto")
GraphProto = _cls("onnx.GraphProto")
NodeProto = _cls("onnx.NodeProto")
TensorProto = _cls("onnx.TensorProto")
ValueInfoProto = _cls("onnx.ValueInfoProto")
TypeProto = _cls("onnx.TypeProto")
AttributeProto = _cls("onnx.AttributeProto")
OperatorSetIdProto = _cls("onnx.OperatorSetIdProto")

# Wire-enum shorthands (TensorProto.DataType / AttributeProto.AttributeType)
FLOAT = TensorProto.FLOAT
INT64 = TensorProto.INT64
INT32 = TensorProto.INT32
INT8 = TensorProto.INT8
UINT8 = TensorProto.UINT8
BOOL = TensorProto.BOOL
DOUBLE = TensorProto.DOUBLE

# Current stable IR version for opset-11 era artifacts. IR version 7
# (2020-5-8) is what torch/tf2onnx emit for opset 11-13 exports and every
# ORT release since 1.2 accepts it; newer IR versions gate features
# (functions, external data v2) this exporter does not use.
IR_VERSION = 7
