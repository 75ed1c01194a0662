"""Executable spec for demo/decoder.js — a numpy mirror of the in-browser
mask decoder, kept in 1:1 correspondence (same tensor table, op order,
float32 arithmetic, and erf approximation) so the JS can be validated in an
image with no JS runtime: tests/test_export_and_amg.py proves this spec
matches the real JAX decoder, and the blob round-trip test proves the
weight table is exact; decoder.js is a direct transcription of this file.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def _matmul(x, W, b=None):
    y = x.astype(F32) @ W.astype(F32)
    if b is not None:
        y = y + b
    return y.astype(F32)


def _layer_norm(x, w, b, eps):
    mean = x.mean(-1, keepdims=True, dtype=F32)
    var = ((x - mean) ** 2).mean(-1, keepdims=True, dtype=F32)
    return ((x - mean) / np.sqrt(var + F32(eps)) * w + b).astype(F32)


def _erf(x):
    # Abramowitz & Stegun 7.1.26 — the exact polynomial decoder.js uses
    s = np.sign(x)
    x = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
                - 0.284496736) * t + 0.254829592) * t * np.exp(-x * x)
    return (s * y).astype(F32)


def _gelu(x):
    return (0.5 * x * (1.0 + _erf(x / np.sqrt(F32(2.0))))).astype(F32)


def _softmax_rows(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return (e / e.sum(-1, keepdims=True)).astype(F32)


class DecoderRef:
    def __init__(self, manifest: dict, blob: bytes):
        self.cfg = manifest["config"]
        floats = np.frombuffer(blob, F32)
        self.t = {}
        for e in manifest["tensors"]:
            n = int(np.prod(e["shape"])) if e["shape"] else 1
            self.t[e["name"]] = floats[e["offset"]: e["offset"] + n].reshape(
                e["shape"]
            )
        eh, ew = self.cfg["embedding_size"]
        self.dense_pe = self._pe_grid(eh, ew)

    def _pe_encode(self, coords_xy):
        G = self.t["prompt_encoder/pe_gaussian"]
        c = (2.0 * coords_xy - 1.0).astype(F32) @ G
        c = 2.0 * np.pi * c
        return np.concatenate([np.sin(c), np.cos(c)], -1).astype(F32)

    def _pe_grid(self, h, w):
        ys = (np.arange(h, dtype=F32) + 0.5) / h
        xs = (np.arange(w, dtype=F32) + 0.5) / w
        gx, gy = np.meshgrid(xs, ys)
        return self._pe_encode(np.stack([gx, gy], -1).reshape(-1, 2))

    def _embed_points(self, clicks):
        S = self.cfg["img_size"]
        N = max(self.cfg.get("max_points", 0), len(clicks)) + 1
        coords = np.zeros((N, 2), F32)
        labels = np.full((N,), -1, np.int32)
        for i, (x, y, lab) in enumerate(clicks):
            coords[i] = [(x + 0.5) / S, (y + 0.5) / S]
            labels[i] = lab
        pe = self._pe_encode(coords)
        pts = self.t["prompt_encoder/point_embeddings"]
        for i in range(N):
            if labels[i] == -1:
                pe[i] = self.t["prompt_encoder/not_a_point_embed"][0]
            elif labels[i] == 1:
                pe[i] += pts[1]
            else:
                pe[i] += pts[0]
        return pe

    def _linear(self, prefix, x):
        return _matmul(x, self.t[prefix + "/w"], self.t.get(prefix + "/b"))

    def _attention(self, prefix, q, k, v):
        nh = self.cfg["num_heads"]
        qp = self._linear(prefix + "/q_proj", q)
        kp = self._linear(prefix + "/k_proj", k)
        vp = self._linear(prefix + "/v_proj", v)
        Ci = qp.shape[-1]
        hd = Ci // nh
        out = np.zeros_like(qp)
        for h in range(nh):
            sl = slice(h * hd, (h + 1) * hd)
            logits = qp[:, sl] @ kp[:, sl].T / np.sqrt(F32(hd))
            out[:, sl] = _softmax_rows(logits) @ vp[:, sl]
        return self._linear(prefix + "/out_proj", out)

    def _norm(self, prefix, x, eps):
        return _layer_norm(x, self.t[prefix + "/w"], self.t[prefix + "/b"], eps)

    def _block(self, prefix, queries, keys, query_pe, key_pe, first):
        eps = self.cfg["ln_eps"]
        if first:
            queries = self._attention(prefix + "/self_attn", queries, queries,
                                      queries)
        else:
            q = queries + query_pe
            queries = queries + self._attention(prefix + "/self_attn", q, q,
                                                queries)
        queries = self._norm(prefix + "/norm1", queries, eps)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self._attention(prefix + "/cross_attn_t2i", q, k,
                                            keys)
        queries = self._norm(prefix + "/norm2", queries, eps)
        h = np.maximum(self._linear(prefix + "/mlp/lin1", queries), 0)
        queries = queries + self._linear(prefix + "/mlp/lin2", h)
        queries = self._norm(prefix + "/norm3", queries, eps)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self._attention(prefix + "/cross_attn_i2t", k, q, queries)
        keys = self._norm(prefix + "/norm4", keys, eps)
        return queries, keys

    def _conv_t2(self, x, H, W, wt, b):
        I, O = wt.shape[2], wt.shape[3]
        y = np.einsum("hwi,pqio->hpwqo", x.reshape(H, W, I), wt)
        y = y.reshape(2 * H, 2 * W, O)
        if b is not None:
            y = y + b
        return y.reshape(-1, O).astype(F32)

    def _mlp(self, prefix, x, n_layers):
        for i in range(n_layers):
            x = self._linear(f"{prefix}/layers/{i}", x)
            if i < n_layers - 1:
                x = np.maximum(x, 0)
        return x

    def decode(self, embedding, clicks):
        """embedding: (eh*ew, C) f32; clicks: [(x, y, label)] in the
        img_size input frame. Returns (low_res (4eh, 4ew) mask-0 logits,
        iou)."""
        cfg = self.cfg
        C = cfg["embed_dim"]
        eh, ew = cfg["embedding_size"]
        nm = cfg["num_mask_tokens"]

        pts = self._embed_points(clicks)
        tokens = np.concatenate(
            [self.t["mask_decoder/iou_token"],
             self.t["mask_decoder/mask_tokens"], pts], 0
        ).astype(F32)
        keys = embedding + self.t["prompt_encoder/no_mask_embed"][0]
        key_pe = self.dense_pe
        queries = tokens
        query_pe = tokens.copy()
        for i in range(cfg["depth"]):
            queries, keys = self._block(
                f"mask_decoder/transformer/layers/{i}", queries, keys,
                query_pe, key_pe, i == 0,
            )
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self._attention(
            "mask_decoder/transformer/final_attn", q, k, keys
        )
        queries = self._norm("mask_decoder/transformer/norm_final", queries,
                             cfg["ln_eps"])

        x = self._conv_t2(keys, eh, ew,
                          self.t["mask_decoder/output_upscaling/convt1/w"],
                          self.t.get("mask_decoder/output_upscaling/convt1/b"))
        x = _layer_norm(x, self.t["mask_decoder/output_upscaling/ln/w"],
                        self.t["mask_decoder/output_upscaling/ln/b"],
                        cfg["ln_eps_decoder"])
        x = _gelu(x)
        x = self._conv_t2(x, 2 * eh, 2 * ew,
                          self.t["mask_decoder/output_upscaling/convt2/w"],
                          self.t.get("mask_decoder/output_upscaling/convt2/b"))
        x = _gelu(x)  # (16*eh*ew, C/8)

        hyper = self._mlp("mask_decoder/hypernetworks/0", queries[1:2], 3)
        low_res = (x @ hyper[0]).reshape(4 * eh, 4 * ew)
        iou = self._mlp("mask_decoder/iou_head", queries[0:1], 3)
        return low_res, float(iou[0, 0])
