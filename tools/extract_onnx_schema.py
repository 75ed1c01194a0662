"""Regenerate the committed ONNX protobuf schema from libtorch's binary.

The reference framework's interchange artifact is ONNX opset 11
(scripts/export_onnx_model.py:97-200); this environment has neither the
``onnx`` package nor network egress, but torch vendors the UPSTREAM
``onnx/onnx-ml.proto`` schema (package renamed ``onnx_torch``) and its
compiled FileDescriptorProto is embedded verbatim in ``libtorch_cpu.so``'s
rodata — protobuf generated code always carries the serialized descriptor.

This tool locates that blob, parses it with ``google.protobuf``, renames the
package back to the standard ``onnx`` (package names are NOT part of the
wire format, so artifacts stay byte-compatible with stock ONNX tooling),
and writes:

- ``sam_quantization_tpu/export_onnx/onnx.proto``      (readable schema)
- ``sam_quantization_tpu/export_onnx/onnx_descriptor.binpb``
  (FileDescriptorSet; loaded at runtime by export_onnx._proto — no protoc
  or generated code needed, only the google.protobuf runtime TF ships)

``tests/test_onnx_export.py`` re-runs the extraction and asserts the
committed descriptor still matches the one in libtorch, and (when protoc
is available) that compiling the .proto text reproduces the descriptor —
so the readable file provably matches the binary one.

Usage: python tools/extract_onnx_schema.py [--check]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

from google.protobuf import descriptor_pb2

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "sam_quantization_tpu", "export_onnx")

_LABELS = {1: "optional", 2: "required", 3: "repeated"}
_TYPES = {
    1: "double", 2: "float", 3: "int64", 4: "uint64", 5: "int32",
    6: "fixed64", 7: "fixed32", 8: "bool", 9: "string", 10: "group",
    12: "bytes", 13: "uint32", 15: "sfixed32", 16: "sfixed64",
    17: "sint32", 18: "sint64",
}


def find_torch_descriptor() -> descriptor_pb2.FileDescriptorProto:
    import torch

    so = os.path.join(os.path.dirname(torch.__file__), "lib", "libtorch_cpu.so")
    data = open(so, "rb").read()
    m = re.search(rb"\x0a[\x10-\x30]onnx/onnx_onnx_torch-ml\.proto", data)
    if not m:
        raise RuntimeError(f"no embedded onnx-ml descriptor found in {so}")
    start = m.start()
    # The blob is stored with an out-of-band length; recover it by taking the
    # longest prefix that parses as a FileDescriptorProto (rodata after the
    # blob belongs to the next descriptor/string and breaks the parse).
    for n in range(min(len(data) - start, 65536), 100, -1):
        fd = descriptor_pb2.FileDescriptorProto()
        try:
            fd.ParseFromString(data[start : start + n])
        except Exception:
            continue
        if any(mt.name == "ModelProto" for mt in fd.message_type):
            return fd
    raise RuntimeError("embedded descriptor found but not parseable")


def rename_package(fd: descriptor_pb2.FileDescriptorProto, pkg: str = "onnx"):
    old = "." + fd.package
    new = "." + pkg
    fd.name = "onnx.proto"
    fd.package = pkg

    def fix_fields(msg):
        for f in msg.field:
            if f.type_name.startswith(old):
                f.type_name = new + f.type_name[len(old):]
        for nested in msg.nested_type:
            fix_fields(nested)

    for msg in fd.message_type:
        fix_fields(msg)
    return fd


def _field_text(f, indent: str) -> str:
    if f.type in (11, 14):  # message / enum
        tname = f.type_name.lstrip(".")
        for pfx in ("onnx.",):
            if tname.startswith(pfx):
                tname = tname[len(pfx):]
    else:
        tname = _TYPES[f.type]
    opts = ""
    if f.options.packed:
        opts = " [packed = true]"
    elif f.HasField("default_value"):
        opts = f" [default = {f.default_value}]"
    return f"{indent}{_LABELS[f.label]} {tname} {f.name} = {f.number}{opts};"


def _enum_text(e, indent: str) -> list:
    lines = [f"{indent}enum {e.name} {{"]
    if e.options.allow_alias:
        lines.append(f"{indent}  option allow_alias = true;")
    for v in e.value:
        lines.append(f"{indent}  {v.name} = {v.number};")
    lines.append(f"{indent}}}")
    return lines


def _message_text(m, indent: str = "") -> list:
    lines = [f"{indent}message {m.name} {{"]
    inner = indent + "  "
    for e in m.enum_type:
        lines += _enum_text(e, inner)
    for nested in m.nested_type:
        lines += _message_text(nested, inner)
    # group plain fields vs oneof members
    oneof_members: dict = {i: [] for i in range(len(m.oneof_decl))}
    for f in m.field:
        if f.HasField("oneof_index"):
            oneof_members[f.oneof_index].append(f)
        else:
            lines.append(_field_text(f, inner))
    for i, od in enumerate(m.oneof_decl):
        lines.append(f"{inner}oneof {od.name} {{")
        for f in oneof_members[i]:
            # oneof members carry no label in .proto text
            txt = _field_text(f, inner + "  ")
            txt = txt.replace("optional ", "", 1)
            lines.append(txt)
        lines.append(f"{inner}}}")
    lines.append(f"{indent}}}")
    return lines


def to_proto_text(fd: descriptor_pb2.FileDescriptorProto) -> str:
    lines = [
        "// ONNX interchange schema (upstream onnx/onnx-ml.proto).",
        "// Regenerated by tools/extract_onnx_schema.py from the descriptor",
        "// embedded in libtorch_cpu.so (torch vendors upstream ONNX); the",
        "// package is renamed onnx_torch -> onnx, which does not affect the",
        "// wire format. Wire-compatible with stock onnx/onnxruntime/netron.",
        'syntax = "proto2";',
        "",
        f"package {fd.package};",
        "",
    ]
    for e in fd.enum_type:
        lines += _enum_text(e, "")
        lines.append("")
    for m in fd.message_type:
        lines += _message_text(m, "")
        lines.append("")
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify committed files match libtorch, don't write")
    ap.add_argument("--out-dir", default=OUT_DIR)
    args = ap.parse_args()

    fd = rename_package(find_torch_descriptor())
    fds = descriptor_pb2.FileDescriptorSet()
    fds.file.add().CopyFrom(fd)
    binpb = fds.SerializeToString()
    text = to_proto_text(fd)

    bin_path = os.path.join(args.out_dir, "onnx_descriptor.binpb")
    txt_path = os.path.join(args.out_dir, "onnx.proto")
    if args.check:
        ok = (
            open(bin_path, "rb").read() == binpb
            and open(txt_path).read() == text
        )
        print("committed ONNX schema matches libtorch:", ok)
        sys.exit(0 if ok else 1)
    os.makedirs(args.out_dir, exist_ok=True)
    open(bin_path, "wb").write(binpb)
    open(txt_path, "w").write(text)
    print(f"wrote {bin_path} ({len(binpb)} bytes) and {txt_path}")


if __name__ == "__main__":
    main()
