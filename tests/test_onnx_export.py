"""ONNX export: schema provenance, serialization, and decoder parity.

The artifact chain under test: upstream schema recovered from libtorch
(tools/extract_onnx_schema.py) → explicit GraphProto construction
(export_onnx/decoder_graph.py) → serialized bytes → independent numpy
interpreter (export_onnx/runtime.py) vs the JAX SamDecoderModule.
Counterpart of the reference's scripts/export_onnx_model.py:97-200 +
onnxruntime check (:176-200), with the numpy runtime standing in for ORT
(not installed in this image).
"""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam_quantization_tpu.export import SamDecoderModule
from sam_quantization_tpu.models.build_sam import sam_model_registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def model():
    return sam_model_registry["vit_tiny"]()


@pytest.fixture(scope="module")
def prompts(model):
    cfg = model.config.prompt_encoder
    h, w = cfg.image_embedding_size
    d = cfg.embed_dim
    rng = np.random.default_rng(7)
    return {
        "emb": (rng.normal(size=(1, h, w, d)) * 0.5).astype(np.float32),
        "coords": rng.uniform(
            10, cfg.input_image_size[0] - 10, size=(1, 4, 2)
        ).astype(np.float32),
        "labels": np.array([[1, 0, 1, -1]], np.float32),
        "mask": (rng.normal(size=(1, 4 * h, 4 * w, 1)) * 2).astype(np.float32),
    }


def _run_both(model, prompts, has_mask: float, **export_kw):
    from sam_quantization_tpu import export_onnx

    blob = export_onnx.export_decoder_onnx(model, num_points=4, **export_kw)
    rt = export_onnx.runtime.load(blob)
    has = np.full((1,), has_mask, np.float32)
    mod = SamDecoderModule(
        model,
        return_single_mask=export_kw.get("return_single_mask", True),
        use_stability_score=export_kw.get("use_stability_score", False),
    )
    jm, jiou, jlow = mod(
        jnp.asarray(prompts["emb"]), jnp.asarray(prompts["coords"]),
        jnp.asarray(prompts["labels"]), jnp.asarray(prompts["mask"]),
        jnp.asarray(has),
    )
    out = rt.run({
        "image_embeddings": prompts["emb"].transpose(0, 3, 1, 2),
        "point_coords": prompts["coords"],
        "point_labels": prompts["labels"],
        "mask_input": prompts["mask"].transpose(0, 3, 1, 2),
        "has_mask_input": has,
    })
    return out, (np.asarray(jm, np.float32), np.asarray(jiou, np.float32),
                 np.asarray(jlow, np.float32))


@pytest.mark.parametrize("has_mask", [1.0, 0.0])
def test_onnx_decoder_parity(model, prompts, has_mask):
    """Serialized ONNX bytes, interpreted per the opset-11 specs, match the
    JAX decoder to float32 precision — both mask-gate branches."""
    out, (jm, jiou, jlow) = _run_both(model, prompts, has_mask)
    np.testing.assert_allclose(out["masks"], jm, atol=1e-4)
    np.testing.assert_allclose(out["iou_predictions"], jiou, atol=1e-5)
    np.testing.assert_allclose(out["low_res_masks"], jlow, atol=1e-4)


def test_onnx_decoder_variants(model, prompts):
    """return_single_mask=False keeps all multimask outputs; the stability
    score selection path also matches the JAX module."""
    out, (jm, jiou, jlow) = _run_both(
        model, prompts, 1.0, return_single_mask=False
    )
    assert out["masks"].shape[1] == model.config.mask_decoder.num_multimask_outputs
    np.testing.assert_allclose(out["masks"], jm, atol=1e-4)
    np.testing.assert_allclose(out["low_res_masks"], jlow, atol=1e-4)

    out, (jm, jiou, jlow) = _run_both(
        model, prompts, 1.0, use_stability_score=True
    )
    np.testing.assert_allclose(out["masks"], jm, atol=1e-4)
    np.testing.assert_allclose(out["iou_predictions"], jiou, atol=1e-5)


def test_onnx_model_structure(model):
    """Artifact-level invariants: IR/opset versions, stable I/O names,
    fixed shapes, and the structural checker accepting the graph (and
    rejecting a topologically broken one)."""
    from sam_quantization_tpu import export_onnx
    from sam_quantization_tpu.export_onnx import _proto as P
    from sam_quantization_tpu.export_onnx.runtime import check_model

    blob = export_onnx.export_decoder_onnx(model, num_points=8)
    m = P.ModelProto()
    m.ParseFromString(blob)
    assert m.ir_version == P.IR_VERSION
    assert m.opset_import[0].domain == "" and m.opset_import[0].version == 11
    ins = {vi.name: [d.dim_value for d in vi.type.tensor_type.shape.dim]
           for vi in m.graph.input}
    d = model.config.prompt_encoder.embed_dim
    h, w = model.config.prompt_encoder.image_embedding_size
    assert ins["image_embeddings"] == [1, d, h, w]
    assert ins["point_coords"] == [1, 8, 2]
    assert ins["mask_input"] == [1, 1, 4 * h, 4 * w]
    assert [vi.name for vi in m.graph.output] == [
        "masks", "iou_predictions", "low_res_masks",
    ]
    # every op must be core-domain opset 11
    allowed = {
        "MatMul", "Add", "Sub", "Mul", "Div", "Sqrt", "Erf", "Sin", "Cos",
        "Relu", "Sigmoid", "Max", "Equal", "Greater", "Where", "Cast",
        "Softmax", "Transpose", "Reshape", "Concat", "Slice", "Gather",
        "Unsqueeze", "ReduceMean", "ReduceSum", "ArgMax", "Expand", "Conv",
        "ConvTranspose", "Resize",
    }
    ops = {n.op_type for n in m.graph.node}
    assert ops <= allowed, ops - allowed
    check_model(m)
    # breaking the topology must be caught
    m.graph.node[0].input[0] = "no_such_tensor"
    with pytest.raises(ValueError, match="undefined tensor"):
        check_model(m)


def test_onnx_schema_provenance():
    """The committed descriptor matches the upstream ONNX schema embedded in
    libtorch, and (when protoc is available) compiling the committed
    onnx.proto text reproduces the same field/enum layout."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "extract_onnx_schema",
        os.path.join(REPO, "tools", "extract_onnx_schema.py"),
    )
    tool = importlib.util.module_from_spec(spec)
    sys.modules["extract_onnx_schema"] = tool
    spec.loader.exec_module(tool)
    from google.protobuf import descriptor_pb2

    fd = tool.rename_package(tool.find_torch_descriptor())
    fds = descriptor_pb2.FileDescriptorSet()
    fds.file.add().CopyFrom(fd)
    committed = open(
        os.path.join(REPO, "sam_quantization_tpu", "export_onnx",
                     "onnx_descriptor.binpb"), "rb",
    ).read()
    assert committed == fds.SerializeToString()

    if not shutil.which("protoc"):
        pytest.skip("protoc not available")
    proto_path = os.path.join(REPO, "sam_quantization_tpu", "export_onnx")
    res = subprocess.run(
        ["protoc", f"--proto_path={proto_path}",
         "--descriptor_set_out=/dev/stdout", "onnx.proto"],
        capture_output=True, check=True,
    )
    compiled = descriptor_pb2.FileDescriptorSet()
    compiled.ParseFromString(res.stdout)

    def norm(f):
        out = []

        def msg(m, pfx):
            for fld in m.field:
                out.append((pfx + m.name, fld.name, fld.number, fld.label,
                            fld.type, fld.type_name))
            for e in m.enum_type:
                out.extend((pfx + m.name + "." + e.name, v.name, v.number)
                           for v in e.value)
            for n in m.nested_type:
                msg(n, pfx + m.name + ".")

        for m in f.message_type:
            msg(m, "")
        for e in f.enum_type:
            out.extend((e.name, v.name, v.number) for v in e.value)
        return sorted(map(str, out))

    assert norm(compiled.file[0]) == norm(fds.file[0])


def test_onnx_export_cli(tmp_path, monkeypatch):
    from sam_quantization_tpu.cli import export as export_cli

    out = tmp_path / "dec.onnx"
    rc = export_cli.main([
        "vit_tiny", "--format", "onnx", "--output", str(out),
        "--num-points", "2", "--platform", "cpu",
    ])
    assert rc == 0 and out.stat().st_size > 10000
    from sam_quantization_tpu.export_onnx import runtime

    rt = runtime.load(str(out))
    assert rt.input_names[0] == "image_embeddings"


def test_onnx_encoder_parity(model):
    """Encoder graph (export_onnx/encoder_graph.py — the reference PPQ
    path's artifact, script/custimized_quant.py:334-344) evaluated by the
    independent numpy runtime vs the JAX encoder."""
    from sam_quantization_tpu import export_onnx
    from sam_quantization_tpu.models import sam as sam_lib

    blob = export_onnx.export_encoder_onnx(model)
    rt = export_onnx.runtime.load(blob)
    S = model.config.image_encoder.img_size
    x = np.random.default_rng(11).normal(size=(1, 3, S, S)).astype(np.float32)
    out = rt.run({"input": x})["image_embeddings"]
    ref = np.asarray(
        sam_lib.encode_image(model, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-5)
    # feeds the decoder graph's image_embeddings input directly
    assert out.shape[1] == model.config.prompt_encoder.embed_dim


def test_onnx_encoder_cli(tmp_path):
    from sam_quantization_tpu.cli import export as export_cli

    out = tmp_path / "encoder.onnx"
    rc = export_cli.main([
        "vit_tiny", "--format", "onnx", "--part", "encoder",
        "--output", str(out), "--platform", "cpu",
    ])
    assert rc == 0 and out.stat().st_size > 1000
