"""ONNX opset-11 export — the reference's interchange artifact, TPU-built.

The reference ships its decoder to browsers/ORT/TRT as ONNX
(scripts/export_onnx_model.py:97-200, script/export_onnx.py:45-60). This
package emits the same artifact WITHOUT the ``onnx`` package: the upstream
schema is recovered from libtorch's embedded descriptor
(tools/extract_onnx_schema.py), the graph is built explicitly
(decoder_graph.py), and the result is validated by an independent numpy
interpreter (runtime.py) against the JAX decoder.

    from sam_quantization_tpu import export_onnx
    blob = export_onnx.export_decoder_onnx(model, "decoder.onnx")
    rt = export_onnx.runtime.load("decoder.onnx")       # no onnxruntime
    out = rt.run({"image_embeddings": ..., "point_coords": ..., ...})

CLI: ``python -m sam_quantization_tpu.cli.export --format onnx``.
"""

from __future__ import annotations

from sam_quantization_tpu.export_onnx import runtime  # noqa: F401
from sam_quantization_tpu.export_onnx.decoder_graph import build_decoder_graph


def export_decoder_onnx(
    model,
    path: str = None,
    num_points: int = 8,
    return_single_mask: bool = True,
    use_stability_score: bool = False,
    stability_score_offset: float = 1.0,
) -> bytes:
    """Serialize ``model``'s prompt-encoder + mask-decoder to ONNX bytes
    (opset 11, IR v7) and optionally write them to ``path``.

    Mirrors :class:`sam_quantization_tpu.export.SamDecoderModule`
    numerically; I/O names/layout follow the reference's SamOnnxModel
    (segment_anything/utils/onnx.py:17-144) so downstream ORT/browser
    consumers are drop-in.
    """
    g = build_decoder_graph(
        model,
        num_points=num_points,
        return_single_mask=return_single_mask,
        use_stability_score=use_stability_score,
        stability_score_offset=stability_score_offset,
    )
    blob = g.build_model(opset=11).SerializeToString()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_encoder_onnx(model, path: str = None) -> bytes:
    """Serialize ``model``'s image encoder to ONNX bytes (opset 11).

    Counterpart of the reference PPQ path's encoder export
    (script/custimized_quant.py:334-344); input "input" is the NCHW
    preprocessed image, output "image_embeddings" feeds the decoder graph.
    """
    from sam_quantization_tpu.export_onnx.encoder_graph import (
        build_encoder_graph,
    )

    g = build_encoder_graph(model)
    blob = g.build_model(opset=11).SerializeToString()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob
