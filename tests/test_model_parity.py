"""Numerical parity of the JAX SAM against the reference torch implementation.

Builds the reference torch modules (from /root/reference, CPU) with random
weights, converts the state dict through our checkpoint converter, and
compares activations. This is the strongest correctness check available
without official checkpoints; tests skip when the reference isn't mounted.
"""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.conftest import REFERENCE_DIR, requires_reference  # noqa: E402

from sam_quantization_tpu.models import (  # noqa: E402
    build_sam,
    image_encoder,
    mask_decoder,
    prompt_encoder,
    sam as sam_lib,
)
from sam_quantization_tpu.models.configs import SamConfig, ImageEncoderConfig  # noqa: E402


def _torch():
    torch = pytest.importorskip("torch")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    # The reference package imports torchvision (absent here) transitively;
    # stub just the symbols its predictor pulls in — unused by these tests.
    import types

    if "torchvision" not in sys.modules:
        def _unavailable(*a, **k):
            raise NotImplementedError("torchvision stub")

        tv = types.ModuleType("torchvision")
        tv.__path__ = []  # mark as package
        tr = types.ModuleType("torchvision.transforms")
        trf = types.ModuleType("torchvision.transforms.functional")
        trf.resize = _unavailable
        trf.to_pil_image = _unavailable
        ops = types.ModuleType("torchvision.ops")
        boxes = types.ModuleType("torchvision.ops.boxes")
        boxes.batched_nms = _unavailable
        boxes.box_area = _unavailable
        tv.transforms = tr
        tr.functional = trf
        tv.ops = ops
        ops.boxes = boxes
        for name, mod in (
            ("torchvision", tv),
            ("torchvision.transforms", tr),
            ("torchvision.transforms.functional", trf),
            ("torchvision.ops", ops),
            ("torchvision.ops.boxes", boxes),
        ):
            sys.modules[name] = mod
    return torch


TINY = SamConfig(
    image_encoder=ImageEncoderConfig(
        img_size=64,
        patch_size=16,
        embed_dim=32,
        depth=2,
        num_heads=2,
        global_attn_indexes=(1,),
        window_size=3,
        out_chans=16,
    ),
)


def build_torch_encoder(torch, cfg: ImageEncoderConfig):
    # The fork hard-codes ViT-H window shapes in its encoder
    # (image_encoder.py:297-305), so for parity at tiny shapes we use the
    # identical upstream ViTDet architecture expressed through torch
    # directly via the reference's building blocks where they are generic.
    from segment_anything.modeling.image_encoder import ImageEncoderViT

    return ImageEncoderViT(
        img_size=cfg.img_size,
        patch_size=cfg.patch_size,
        in_chans=cfg.in_chans,
        embed_dim=cfg.embed_dim,
        depth=cfg.depth,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        out_chans=cfg.out_chans,
        qkv_bias=cfg.qkv_bias,
        norm_layer=__import__("functools").partial(
            __import__("torch").nn.LayerNorm, eps=1e-6
        ),
        use_rel_pos=cfg.use_rel_pos,
        window_size=cfg.window_size,
        global_attn_indexes=cfg.global_attn_indexes,
    )


def randomize(torch, model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


@requires_reference
def test_prompt_encoder_parity(rng):
    torch = _torch()
    from segment_anything.modeling.prompt_encoder import PromptEncoder

    cfg = TINY.prompt_encoder
    tm = randomize(torch, PromptEncoder(
        embed_dim=cfg.embed_dim,
        image_embedding_size=cfg.image_embedding_size,
        input_image_size=cfg.input_image_size,
        mask_in_chans=cfg.mask_in_chans,
    ))
    sd = {f"prompt_encoder.{k}": v.numpy() for k, v in tm.state_dict().items()}

    # Build only the prompt-encoder part of the pytree.
    full = {**sd}
    model_p = _convert_prompt_only(full, cfg)

    pts = rng.uniform(0, 1024, size=(2, 3, 2)).astype(np.float32)
    labels = np.array([[1, 0, 1], [1, -1, -1]], dtype=np.float32)
    with torch.no_grad():
        t_sparse, t_dense = tm(
            points=(torch.tensor(pts), torch.tensor(labels)), boxes=None, masks=None
        )
    j_sparse, j_dense = prompt_encoder.apply(
        model_p, cfg, points=(jnp.asarray(pts), jnp.asarray(labels))
    )
    np.testing.assert_allclose(
        np.asarray(j_sparse), t_sparse.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    # dense: ours NHWC vs torch NCHW
    np.testing.assert_allclose(
        np.asarray(j_dense).transpose(0, 3, 1, 2), t_dense.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    # dense PE grid
    with torch.no_grad():
        t_pe = tm.get_dense_pe()
    j_pe = prompt_encoder.get_dense_pe(model_p, cfg)
    np.testing.assert_allclose(
        np.asarray(j_pe).transpose(0, 3, 1, 2), t_pe.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def _convert_prompt_only(sd, cfg):
    from sam_quantization_tpu.models.build_sam import _arr, _conv_p, _ln

    pe = "prompt_encoder"
    return {
        "pe_gaussian": _arr(sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embeddings": jnp.concatenate(
            [_arr(sd[f"{pe}.point_embeddings.{i}.weight"]) for i in range(4)], axis=0
        ),
        "not_a_point_embed": _arr(sd[f"{pe}.not_a_point_embed.weight"]),
        "no_mask_embed": _arr(sd[f"{pe}.no_mask_embed.weight"]),
        "mask_downscaling": {
            "conv1": _conv_p(sd, f"{pe}.mask_downscaling.0"),
            "ln1": _ln(sd, f"{pe}.mask_downscaling.1"),
            "conv2": _conv_p(sd, f"{pe}.mask_downscaling.3"),
            "ln2": _ln(sd, f"{pe}.mask_downscaling.4"),
            "conv3": _conv_p(sd, f"{pe}.mask_downscaling.6"),
        },
    }


@requires_reference
def test_mask_prompt_parity(rng):
    torch = _torch()
    from segment_anything.modeling.prompt_encoder import PromptEncoder

    cfg = TINY.prompt_encoder
    tm = randomize(torch, PromptEncoder(
        embed_dim=cfg.embed_dim,
        image_embedding_size=cfg.image_embedding_size,
        input_image_size=cfg.input_image_size,
        mask_in_chans=cfg.mask_in_chans,
    ))
    sd = {f"prompt_encoder.{k}": v.numpy() for k, v in tm.state_dict().items()}
    model_p = _convert_prompt_only(sd, cfg)
    h, w = cfg.image_embedding_size
    masks = rng.normal(size=(2, 1, 4 * h, 4 * w)).astype(np.float32)
    with torch.no_grad():
        _, t_dense = tm(points=None, boxes=None, masks=torch.tensor(masks))
    _, j_dense = prompt_encoder.apply(
        model_p, cfg, masks=jnp.asarray(masks.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(j_dense).transpose(0, 3, 1, 2), t_dense.detach().numpy(), rtol=1e-4, atol=1e-4
    )


@requires_reference
def test_two_way_transformer_and_decoder_parity(rng):
    torch = _torch()
    from segment_anything.modeling.mask_decoder import MaskDecoder
    from segment_anything.modeling.transformer import TwoWayTransformer

    dcfg = TINY.mask_decoder
    tcfg = dcfg.transformer
    tm = randomize(torch, MaskDecoder(
        transformer_dim=dcfg.transformer_dim,
        transformer=TwoWayTransformer(
            depth=tcfg.depth,
            embedding_dim=tcfg.embedding_dim,
            mlp_dim=tcfg.mlp_dim,
            num_heads=tcfg.num_heads,
        ),
        num_multimask_outputs=dcfg.num_multimask_outputs,
        iou_head_depth=dcfg.iou_head_depth,
        iou_head_hidden_dim=dcfg.iou_head_hidden_dim,
    ))
    sd = {f"mask_decoder.{k}": v.numpy() for k, v in tm.state_dict().items()}
    # Reuse the full converter by faking the other components' keys.
    jp = _convert_decoder_only(sd, dcfg)

    B, h, w, c = 2, 8, 8, dcfg.transformer_dim
    emb = rng.normal(size=(1, c, h, w)).astype(np.float32)
    pe = rng.normal(size=(1, c, h, w)).astype(np.float32)
    sparse = rng.normal(size=(B, 3, c)).astype(np.float32)
    dense = rng.normal(size=(B, c, h, w)).astype(np.float32)
    with torch.no_grad():
        t_masks, t_iou = tm(
            image_embeddings=torch.tensor(emb),
            image_pe=torch.tensor(pe),
            sparse_prompt_embeddings=torch.tensor(sparse),
            dense_prompt_embeddings=torch.tensor(dense),
            multimask_output=True,
        )
    j_masks, j_iou = mask_decoder.apply(
        jp,
        dcfg,
        jnp.asarray(emb.transpose(0, 2, 3, 1)),
        jnp.asarray(pe.transpose(0, 2, 3, 1)),
        jnp.asarray(sparse),
        jnp.asarray(dense.transpose(0, 2, 3, 1)),
        multimask_output=True,
    )
    np.testing.assert_allclose(np.asarray(j_iou), t_iou.detach().numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(j_masks), t_masks.detach().numpy(), rtol=1e-3, atol=1e-4
    )


def _convert_decoder_only(sd, dcfg):
    from sam_quantization_tpu.models.build_sam import _arr, _convt, _lin, _ln

    md = "mask_decoder"
    tcfg = dcfg.transformer

    def attn_p(prefix):
        return {
            "q_proj": _lin(sd, f"{prefix}.q_proj"),
            "k_proj": _lin(sd, f"{prefix}.k_proj"),
            "v_proj": _lin(sd, f"{prefix}.v_proj"),
            "out_proj": _lin(sd, f"{prefix}.out_proj"),
        }

    layers = []
    for i in range(tcfg.depth):
        t = f"{md}.transformer.layers.{i}"
        layers.append({
            "self_attn": attn_p(f"{t}.self_attn"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "cross_attn_t2i": attn_p(f"{t}.cross_attn_token_to_image"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "mlp": {
                "lin1": _lin(sd, f"{t}.mlp.lin1"),
                "lin2": _lin(sd, f"{t}.mlp.lin2"),
            },
            "norm3": _ln(sd, f"{t}.norm3"),
            "norm4": _ln(sd, f"{t}.norm4"),
            "cross_attn_i2t": attn_p(f"{t}.cross_attn_image_to_token"),
        })

    def mlp(prefix, n=3):
        return {"layers": [_lin(sd, f"{prefix}.layers.{j}") for j in range(n)]}

    return {
        "transformer": {
            "layers": layers,
            "final_attn": attn_p(f"{md}.transformer.final_attn_token_to_image"),
            "norm_final": _ln(sd, f"{md}.transformer.norm_final_attn"),
        },
        "iou_token": _arr(sd[f"{md}.iou_token.weight"]),
        "mask_tokens": _arr(sd[f"{md}.mask_tokens.weight"]),
        "output_upscaling": {
            "convt1": {
                "w": _convt(sd[f"{md}.output_upscaling.0.weight"]),
                "b": _arr(sd[f"{md}.output_upscaling.0.bias"]),
            },
            "ln": _ln(sd, f"{md}.output_upscaling.1"),
            "convt2": {
                "w": _convt(sd[f"{md}.output_upscaling.3.weight"]),
                "b": _arr(sd[f"{md}.output_upscaling.3.bias"]),
            },
        },
        "hypernetworks": [
            mlp(f"{md}.output_hypernetworks_mlps.{i}")
            for i in range(dcfg.num_mask_tokens)
        ],
        "iou_head": mlp(f"{md}.iou_prediction_head", dcfg.iou_head_depth),
    }


@requires_reference
def test_image_encoder_parity(rng):
    """Full encoder vs upstream torch ViTDet at a tiny config.

    Note: the reference *fork* hard-codes ViT-H window shapes; upstream
    semantics (which the fork implements for ViT-H) are generic, and our
    implementation is validated against the generic form. The torch module
    here comes from the reference tree but at a config where its hard-coded
    path is bypassed (window_size must divide padded grid the same way).
    """
    torch = _torch()
    cfg = TINY.image_encoder

    # The fork's window_partition is hard-coded; monkeypatch the generic one.
    import segment_anything.modeling.image_encoder as ref_ie

    def generic_partition(x, window_size):
        import torch.nn.functional as TF

        B, H, W, C = x.shape
        pad_h = (window_size - H % window_size) % window_size
        pad_w = (window_size - W % window_size) % window_size
        if pad_h > 0 or pad_w > 0:
            x = TF.pad(x, (0, 0, 0, pad_w, 0, pad_h))
        Hp, Wp = H + pad_h, W + pad_w
        x = x.view(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
        windows = (
            x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, window_size, window_size, C)
        )
        return windows, (Hp, Wp)

    def generic_unpartition(windows, window_size, pad_hw, hw):
        Hp, Wp = pad_hw
        H, W = hw
        B = windows.shape[0] // (Hp * Wp // window_size // window_size)
        x = windows.view(
            B, Hp // window_size, Wp // window_size, window_size, window_size, -1
        )
        x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, Hp, Wp, -1)
        if Hp > H or Wp > W:
            x = x[:, :H, :W, :].contiguous()
        return x

    orig_p, orig_u = ref_ie.window_partition, ref_ie.window_unpartition
    ref_ie.window_partition = generic_partition
    ref_ie.window_unpartition = generic_unpartition
    try:
        tm = randomize(torch, build_torch_encoder(torch, cfg))
        sd = {f"image_encoder.{k}": v.numpy() for k, v in tm.state_dict().items()}
        # pos_embed exists
        full_cfg = TINY
        model = build_sam.convert_torch_state_dict(
            {**sd, **_fake_rest_keys(torch, full_cfg)}, full_cfg
        )
        x = rng.normal(size=(1, 3, cfg.img_size, cfg.img_size)).astype(np.float32)
        with torch.no_grad():
            t_out = tm(torch.tensor(x))
        j_out = image_encoder.apply(
            model.image_encoder, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg,
            attn_impl="xla",
        )
        np.testing.assert_allclose(
            np.asarray(j_out).transpose(0, 3, 1, 2), t_out.detach().numpy(), rtol=1e-3, atol=1e-4
        )
    finally:
        ref_ie.window_partition = orig_p
        ref_ie.window_unpartition = orig_u


def _fake_rest_keys(torch, cfg: SamConfig):
    """Minimal random prompt-encoder/decoder state dict entries so the full
    converter runs (encoder-only tests discard them)."""
    from segment_anything.modeling.mask_decoder import MaskDecoder
    from segment_anything.modeling.prompt_encoder import PromptEncoder
    from segment_anything.modeling.transformer import TwoWayTransformer

    pcfg, dcfg = cfg.prompt_encoder, cfg.mask_decoder
    pe = PromptEncoder(
        embed_dim=pcfg.embed_dim,
        image_embedding_size=pcfg.image_embedding_size,
        input_image_size=pcfg.input_image_size,
        mask_in_chans=pcfg.mask_in_chans,
    )
    md = MaskDecoder(
        transformer_dim=dcfg.transformer_dim,
        transformer=TwoWayTransformer(
            depth=dcfg.transformer.depth,
            embedding_dim=dcfg.transformer.embedding_dim,
            mlp_dim=dcfg.transformer.mlp_dim,
            num_heads=dcfg.transformer.num_heads,
        ),
        num_multimask_outputs=dcfg.num_multimask_outputs,
        iou_head_depth=dcfg.iou_head_depth,
        iou_head_hidden_dim=dcfg.iou_head_hidden_dim,
    )
    out = {f"prompt_encoder.{k}": v.numpy() for k, v in pe.state_dict().items()}
    out.update({f"mask_decoder.{k}": v.numpy() for k, v in md.state_dict().items()})
    return out


@requires_reference
def test_predictor_box_prompt_parity(rng):
    """Box prompts through SamPredictor match the reference's _embed_boxes
    semantics (corner embeddings, no padding point)."""
    torch = _torch()
    from segment_anything.modeling.prompt_encoder import PromptEncoder

    cfg = TINY.prompt_encoder
    tm = randomize(torch, PromptEncoder(
        embed_dim=cfg.embed_dim,
        image_embedding_size=cfg.image_embedding_size,
        input_image_size=cfg.input_image_size,
        mask_in_chans=cfg.mask_in_chans,
    ))
    sd = {f"prompt_encoder.{k}": v.numpy() for k, v in tm.state_dict().items()}
    model_p = _convert_prompt_only(sd, cfg)
    boxes = np.array([[10.0, 20.0, 90.0, 110.0]], np.float32)
    with torch.no_grad():
        t_sparse, _ = tm(points=None, boxes=torch.tensor(boxes), masks=None)
    j_sparse, _ = prompt_encoder.apply(model_p, cfg, boxes=jnp.asarray(boxes))
    np.testing.assert_allclose(
        np.asarray(j_sparse), t_sparse.detach().numpy(), rtol=1e-4, atol=1e-5
    )
