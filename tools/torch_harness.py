"""Torch-side reference harness: run a SAM checkpoint exported from this
framework under the *reference's own torch modules* with the reference's
5-click evaluation semantics (script/evaluation2.py:225-334).

This is the external oracle for the cross-harness validation
(tools/cross_validate_harness.py): the reference code at /root/reference is
imported and driven, not copied. Only two leaf functions are monkeypatched —
the fork hard-codes ViT-H shapes in window_partition/unpartition
(segment_anything/modeling/image_encoder.py:293-305), so at tiny configs we
install the generic upstream semantics (the commented-out lines of the same
functions), exactly as tests/test_model_parity.py does.

Requires torch + the mounted reference; CPU only.
"""

from __future__ import annotations

import sys
import types
from typing import List, Sequence, Tuple

import numpy as np

REFERENCE_DIR = "/root/reference"


def _import_reference_torch():
    import torch

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    # the reference package pulls torchvision symbols its predictor needs;
    # stub them (unused by the encoder/decoder path)
    if "torchvision" not in sys.modules:
        def _unavailable(*a, **k):
            raise NotImplementedError("torchvision stub")

        tv = types.ModuleType("torchvision")
        tv.__path__ = []
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


def install_generic_windows():
    """Replace the fork's hard-coded ViT-H window partition with the generic
    upstream form (the commented-out code of the same functions,
    image_encoder.py:293-305, 324-328) so non-ViT-H configs run."""
    torch = _import_reference_torch()
    import torch.nn.functional as TF

    import segment_anything.modeling.image_encoder as ref_ie

    def generic_partition(x, window_size):
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

    ref_ie.window_partition = generic_partition
    ref_ie.window_unpartition = generic_unpartition


def install_upstream_rel_pos():
    """Replace the fork's broadcast-matmul ``rel_w`` with the upstream einsum
    (the commented-out line of the same function).

    The fork rewrote ``torch.einsum("bhwc,wkc->bhwk", r_q, Rw)`` as
    ``torch.matmul(r_q, Rw.transpose(1, 2))`` (image_encoder.py:402-404).
    matmul batch-broadcasting right-aligns r_q's (B, h) batch dims with
    Rw's (w,) — so the product indexes **Rw by h instead of w**. It only
    runs because q_h == q_w at every SAM shape; the result is a wrong
    rel_w bias (verified: at the vit_tiny checkpoint the fork's form moves
    the encoder embedding by max 0.30 (10% of scale) vs the einsum form,
    while JAX-vs-einsum agreement is 1.9e-6 — tools/cross_validate_harness
    round 5). ``rel_h`` is unaffected (its batch dims align correctly).

    This framework implements the upstream einsum semantics
    (models/image_encoder.decomposed_rel_pos_tiles); call this to make the
    oracle match intent, or skip it to measure the fork-behavior delta.

    Returns an ``uninstall()`` callable restoring the fork's as-committed
    function — the patch mutates the SHARED segment_anything module, so a
    later fork-behavior measurement in the same process would silently see
    upstream semantics unless restored (use try/finally around the
    upstream-semantics section).
    """
    torch = _import_reference_torch()

    import segment_anything.modeling.image_encoder as ref_ie

    fork_fn = ref_ie.add_decomposed_rel_pos

    def uninstall():
        ref_ie.add_decomposed_rel_pos = fork_fn

    get_rel_pos = ref_ie.get_rel_pos

    def upstream_add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w,
                                        q_size, k_size):
        q_h, q_w = q_size
        k_h, k_w = k_size
        Rh = get_rel_pos(q_h, k_h, rel_pos_h)
        Rw = get_rel_pos(q_w, k_w, rel_pos_w)
        B, _, dim = q.shape
        r_q = q.reshape(B, q_h, q_w, dim)
        rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
        return (
            attn.view(B, q_h, q_w, k_h, k_w)
            + rel_h[:, :, :, :, None]
            + rel_w[:, :, :, None, :]
        ).view(B, q_h * q_w, k_h * k_w)

    ref_ie.add_decomposed_rel_pos = upstream_add_decomposed_rel_pos
    return uninstall


def build_reference_torch_sam(cfg, state_dict: dict):
    """Instantiate the reference's ImageEncoderViT / PromptEncoder /
    MaskDecoder at our :class:`SamConfig` hyperparameters and strict-load an
    exported state dict (models.build_sam.to_torch_state_dict).

    Returns a namespace with .image_encoder/.prompt_encoder/.mask_decoder —
    the exact three attributes script/evaluation2.py:271-313 drives.
    """
    torch = _import_reference_torch()
    install_generic_windows()
    import functools

    from segment_anything.modeling.image_encoder import ImageEncoderViT
    from segment_anything.modeling.mask_decoder import MaskDecoder
    from segment_anything.modeling.prompt_encoder import PromptEncoder
    from segment_anything.modeling.transformer import TwoWayTransformer

    ecfg, pcfg, dcfg = cfg.image_encoder, cfg.prompt_encoder, cfg.mask_decoder
    enc = ImageEncoderViT(
        img_size=ecfg.img_size,
        patch_size=ecfg.patch_size,
        in_chans=ecfg.in_chans,
        embed_dim=ecfg.embed_dim,
        depth=ecfg.depth,
        num_heads=ecfg.num_heads,
        mlp_ratio=ecfg.mlp_ratio,
        out_chans=ecfg.out_chans,
        qkv_bias=ecfg.qkv_bias,
        norm_layer=functools.partial(torch.nn.LayerNorm, eps=1e-6),
        use_rel_pos=ecfg.use_rel_pos,
        window_size=ecfg.window_size,
        global_attn_indexes=ecfg.global_attn_indexes,
    )
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

    def sub(prefix):
        plen = len(prefix) + 1
        return {
            k[plen:]: torch.tensor(v)
            for k, v in state_dict.items()
            if k.startswith(prefix + ".")
        }

    enc.load_state_dict(sub("image_encoder"), strict=True)
    pe.load_state_dict(sub("prompt_encoder"), strict=True)
    md.load_state_dict(sub("mask_decoder"), strict=True)
    enc.eval(), pe.eval(), md.eval()
    ns = types.SimpleNamespace(image_encoder=enc, prompt_encoder=pe, mask_decoder=md)
    return ns


def reference_click_loop(
    tsam,
    samples: Sequence[Tuple[np.ndarray, np.ndarray]],
    clicks: Sequence[Sequence[Tuple[int, int, float]]],
    num_clicks: int = 5,
    max_points: int = 24,
    point_layout: str = "literal",
    mask_override: Sequence[Sequence[np.ndarray]] = None,
    return_low_res: bool = False,
):
    """The reference's 5-click loop (script/evaluation2.py:276-331) under the
    reference's torch modules, replaying pinned ``clicks``.

    Per click: accumulate click points, prompt-encode (mask prompt =
    low_res_masks from click 2, :301-306), mask_decoder multimask=False
    (:307-313), bilinear-interpolate low_res to gt size, threshold > 0, IoU
    with ignore_label=-1 (:156-167, 316-326).

    ``point_layout``: "slots" uses this framework's fixed ``max_points``
    padded slots (labels -1 = padding — the reference prompt encoder's own
    pad semantics, prompt_encoder.py:83-92) so both harnesses present the
    identical token set; "literal" grows the point list click by click
    exactly as evaluation2.py:278-296 does (k points + 1 pad point after k
    clicks). Running both quantifies the slot-padding delta.

    ``mask_override``: per-sample per-click low-res mask logits (NCHW, from
    the OTHER harness's recording — click_eval ``record_low_res``). When
    set, click k's mask prompt is ``mask_override[si][k-1]`` instead of this
    loop's own previous prediction — teacher forcing, so the per-click gap
    measures pure single-forward numeric drift with no cascade compounding.
    """
    torch = _import_reference_torch()
    import torch.nn.functional as TF

    all_ious: List[List[float]] = []
    all_low_res: List[List[np.ndarray]] = []
    with torch.no_grad():
        for si, (image, gt) in enumerate(samples):
            img = np.asarray(image, np.float32)
            if img.ndim == 4:
                img = img[0]
            x = torch.tensor(img.transpose(2, 0, 1))[None]  # NCHW
            image_embedding = tsam.image_encoder(x)  # (1, C, h, w)
            gt_t = torch.tensor(np.asarray(gt) > 0)
            low_res_masks = None
            ious: List[float] = []
            sample_low_res: List[np.ndarray] = []
            coords = np.zeros((1, max_points, 2), np.float32)
            labels = -np.ones((1, max_points), np.float32)
            for k in range(num_clicks):
                cy, cx, lab = clicks[si][k]
                coords[0, k] = (cx, cy)
                labels[0, k] = lab
                if point_layout == "slots":
                    pts = (torch.tensor(coords), torch.tensor(labels))
                else:
                    pts = (
                        torch.tensor(coords[:, : k + 1]),
                        torch.tensor(labels[:, : k + 1]),
                    )
                if k == 0:
                    mask_prompt = None
                elif mask_override is not None:
                    mask_prompt = torch.tensor(
                        np.asarray(mask_override[si][k - 1], np.float32)
                    )
                else:
                    mask_prompt = low_res_masks
                sparse, dense = tsam.prompt_encoder(
                    points=pts,
                    boxes=None,
                    masks=mask_prompt,
                )
                low_res_masks, _iou_pred = tsam.mask_decoder(
                    image_embeddings=image_embedding,
                    image_pe=tsam.prompt_encoder.get_dense_pe(),
                    sparse_prompt_embeddings=sparse,
                    dense_prompt_embeddings=dense,
                    multimask_output=False,
                )
                prev = TF.interpolate(
                    low_res_masks,
                    size=gt_t.shape[-2:],
                    mode="bilinear",
                    align_corners=False,
                )
                pred = prev[0, 0] > 0
                inter = (pred & gt_t).sum().item()
                union = (pred | gt_t).sum().item()
                ious.append(inter / max(union, 1))
                if return_low_res:
                    sample_low_res.append(low_res_masks.numpy().copy())
            all_ious.append(ious)
            if return_low_res:
                all_low_res.append(sample_low_res)
    if return_low_res:
        return all_ious, all_low_res
    return all_ious
