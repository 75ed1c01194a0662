/* In-browser SAM mask decoder — dependency-free JavaScript.
 *
 * Counterpart of the reference demo's client-side decode: the reference
 * runs the exported ONNX decoder with onnxruntime-web
 * (/root/reference/demo/README.md:1-28, demo/src/App.tsx); here the decoder
 * (prompt embedding + TwoWayTransformer + upscaling + hypernetwork MLPs +
 * IoU head) is implemented directly on Float32Arrays, fed by the weight
 * blob from sam_quantization_tpu/export_js.py. The image embedding comes
 * from the server once per image (the reference demo precomputes embeddings
 * server-side the same way); every click then decodes entirely in the
 * browser.
 *
 * Weight layouts match nn/functional.py: linear w is (in, out); conv
 * kernels HWIO; activations NHWC (row-major = natural JS order).
 */
'use strict';

const SamDecoder = (() => {

function matmul(x, M, K, W, N, b) {
  const y = new Float32Array(M * N);
  for (let i = 0; i < M; i++) {
    const xo = i * K, yo = i * N;
    if (b) y.set(b, yo);
    for (let k = 0; k < K; k++) {
      const a = x[xo + k];
      if (a === 0) continue;
      const wo = k * N;
      for (let j = 0; j < N; j++) y[yo + j] += a * W[wo + j];
    }
  }
  return y;
}

function layerNorm(x, M, N, w, b, eps) {
  const y = new Float32Array(M * N);
  for (let i = 0; i < M; i++) {
    const o = i * N;
    let mean = 0;
    for (let j = 0; j < N; j++) mean += x[o + j];
    mean /= N;
    let v = 0;
    for (let j = 0; j < N; j++) { const d = x[o + j] - mean; v += d * d; }
    const inv = 1.0 / Math.sqrt(v / N + eps);
    for (let j = 0; j < N; j++) y[o + j] = (x[o + j] - mean) * inv * w[j] + b[j];
  }
  return y;
}

function erf(x) {
  // Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7)
  const s = x < 0 ? -1 : 1;
  x = Math.abs(x);
  const t = 1 / (1 + 0.3275911 * x);
  const y = 1 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * Math.exp(-x * x);
  return s * y;
}

function geluInPlace(x) {
  for (let i = 0; i < x.length; i++) {
    x[i] = 0.5 * x[i] * (1 + erf(x[i] / Math.SQRT2));
  }
  return x;
}

function reluInPlace(x) {
  for (let i = 0; i < x.length; i++) if (x[i] < 0) x[i] = 0;
  return x;
}

function addInPlace(a, b) {
  for (let i = 0; i < a.length; i++) a[i] += b[i];
  return a;
}

function addRowInPlace(x, M, N, row) {
  for (let i = 0; i < M; i++) {
    const o = i * N;
    for (let j = 0; j < N; j++) x[o + j] += row[j];
  }
  return x;
}

function softmaxRows(x, M, N) {
  for (let i = 0; i < M; i++) {
    const o = i * N;
    let mx = -Infinity;
    for (let j = 0; j < N; j++) if (x[o + j] > mx) mx = x[o + j];
    let s = 0;
    for (let j = 0; j < N; j++) { x[o + j] = Math.exp(x[o + j] - mx); s += x[o + j]; }
    for (let j = 0; j < N; j++) x[o + j] /= s;
  }
  return x;
}

class Decoder {
  constructor(manifest, blobBuffer) {
    this.cfg = manifest.config;
    this.t = {};
    for (const e of manifest.tensors) {
      const n = e.shape.reduce((a, v) => a * v, 1);
      this.t[e.name] = new Float32Array(blobBuffer, e.offset * 4, n);
      this.t[e.name].shape = e.shape;
    }
    const [eh, ew] = this.cfg.embedding_size;
    this.densePE = this._peGrid(eh, ew);  // (eh*ew, C)
  }

  _peEncode(coordsXY, M) {
    // [0,1]-normalized (x, y) pairs -> (M, C) Fourier features
    // (ref prompt_encoder.py:193-200)
    const G = this.t['prompt_encoder/pe_gaussian'];  // (2, C/2)
    const C2 = G.shape[1], C = 2 * C2;
    const out = new Float32Array(M * C);
    for (let i = 0; i < M; i++) {
      const cx = 2 * coordsXY[2 * i] - 1, cy = 2 * coordsXY[2 * i + 1] - 1;
      const o = i * C;
      for (let j = 0; j < C2; j++) {
        const p = 2 * Math.PI * (cx * G[j] + cy * G[C2 + j]);
        out[o + j] = Math.sin(p);
        out[o + C2 + j] = Math.cos(p);
      }
    }
    return out;
  }

  _peGrid(h, w) {
    const coords = new Float32Array(h * w * 2);
    for (let y = 0; y < h; y++) {
      for (let x = 0; x < w; x++) {
        coords[2 * (y * w + x)] = (x + 0.5) / w;
        coords[2 * (y * w + x) + 1] = (y + 0.5) / h;
      }
    }
    return this._peEncode(coords, h * w);
  }

  // clicks: [{x, y, label}] in the img_size input frame (label 1 pos / 0 neg)
  _embedPoints(clicks) {
    const C = this.cfg.embed_dim;
    // pad to max_points slots + 1 pad point, mirroring SamPredictor's
    // fixed-shape decode so browser and server masks agree exactly
    const N = Math.max(this.cfg.max_points || 0, clicks.length) + 1;
    const coords = new Float32Array(N * 2);
    const labels = new Int32Array(N).fill(-1);
    const S = this.cfg.img_size;
    clicks.forEach((c, i) => {
      coords[2 * i] = (c.x + 0.5) / S;
      coords[2 * i + 1] = (c.y + 0.5) / S;
      labels[i] = c.label;
    });
    labels[N - 1] = -1;
    const pe = this._peEncode(coords, N);
    const nap = this.t['prompt_encoder/not_a_point_embed'];
    const neg = this.t['prompt_encoder/point_embeddings'].subarray(0, C);
    const pos = this.t['prompt_encoder/point_embeddings'].subarray(C, 2 * C);
    for (let i = 0; i < N; i++) {
      const o = i * C;
      if (labels[i] === -1) {
        for (let j = 0; j < C; j++) pe[o + j] = nap[j];
      } else {
        const add = labels[i] === 1 ? pos : neg;
        for (let j = 0; j < C; j++) pe[o + j] += add[j];
      }
    }
    pe.rows = N;
    return pe;
  }

  _linear(prefix, x, M) {
    const w = this.t[prefix + '/w'];
    return matmul(x, M, w.shape[0], w, w.shape[1], this.t[prefix + '/b']);
  }

  // Projected multi-head attention (models/transformer.py:65-92)
  _attention(prefix, q, Tq, k, Tk, v) {
    const nh = this.cfg.num_heads;
    const qp = this._linear(prefix + '/q_proj', q, Tq);
    const kp = this._linear(prefix + '/k_proj', k, Tk);
    const vp = this._linear(prefix + '/v_proj', v, Tk);
    const Ci = this.t[prefix + '/q_proj/w'].shape[1];
    const hd = Ci / nh, scale = 1 / Math.sqrt(hd);
    const out = new Float32Array(Tq * Ci);
    const logits = new Float32Array(Tq * Tk);
    for (let h = 0; h < nh; h++) {
      const ho = h * hd;
      for (let i = 0; i < Tq; i++) {
        const qo = i * Ci + ho, lo = i * Tk;
        for (let j = 0; j < Tk; j++) {
          const ko = j * Ci + ho;
          let s = 0;
          for (let d = 0; d < hd; d++) s += qp[qo + d] * kp[ko + d];
          logits[lo + j] = s * scale;
        }
      }
      softmaxRows(logits, Tq, Tk);
      for (let i = 0; i < Tq; i++) {
        const oo = i * Ci + ho, lo = i * Tk;
        for (let j = 0; j < Tk; j++) {
          const a = logits[lo + j];
          if (a === 0) continue;
          const vo = j * Ci + ho;
          for (let d = 0; d < hd; d++) out[oo + d] += a * vp[vo + d];
        }
      }
    }
    return this._linear(prefix + '/out_proj', out, Tq);
  }

  _norm(prefix, x, M, eps) {
    return layerNorm(x, M, this.t[prefix + '/w'].shape[0],
                     this.t[prefix + '/w'], this.t[prefix + '/b'], eps);
  }

  // TwoWayAttentionBlock (models/transformer.py:95-160)
  _block(prefix, queries, T, keys, NK, queryPE, keyPE, first) {
    const C = this.cfg.embed_dim, eps = this.cfg.ln_eps;
    if (first) {
      queries = this._attention(prefix + '/self_attn', queries, T, queries, T,
                                queries);
    } else {
      const q = addInPlace(queries.slice(), queryPE);
      addInPlace(queries, this._attention(prefix + '/self_attn', q, T, q, T,
                                          queries));
    }
    queries = this._norm(prefix + '/norm1', queries, T, eps);

    let q = addInPlace(queries.slice(), queryPE);
    let k = addInPlace(keys.slice(), keyPE);
    addInPlace(queries,
               this._attention(prefix + '/cross_attn_t2i', q, T, k, NK, keys));
    queries = this._norm(prefix + '/norm2', queries, T, eps);

    const h = reluInPlace(this._linear(prefix + '/mlp/lin1', queries, T));
    addInPlace(queries, this._linear(prefix + '/mlp/lin2', h, T));
    queries = this._norm(prefix + '/norm3', queries, T, eps);

    q = addInPlace(queries.slice(), queryPE);
    k = addInPlace(keys.slice(), keyPE);
    addInPlace(keys,
               this._attention(prefix + '/cross_attn_i2t', k, NK, q, T, queries));
    keys = this._norm(prefix + '/norm4', keys, NK, eps);
    return [queries, keys];
  }

  _convT2(x, H, W, wt, b) {
    // ConvTranspose2d(k=2, s=2) NHWC/HWIO: each output pixel receives
    // exactly one (kh, kw) contribution (nn/functional.py:110-131)
    const I = wt.shape[2], O = wt.shape[3];
    const out = new Float32Array(4 * H * W * O);
    for (let kh = 0; kh < 2; kh++) {
      for (let kw = 0; kw < 2; kw++) {
        const wOff = (kh * 2 + kw) * I * O;
        for (let p = 0; p < H * W; p++) {
          const xo = p * I;
          const oy = (p / W | 0) * 2 + kh, ox = (p % W) * 2 + kw;
          const oo = (oy * 2 * W + ox) * O;
          if (b) out.set(b, oo);
          for (let i = 0; i < I; i++) {
            const a = x[xo + i];
            if (a === 0) continue;
            const wo = wOff + i * O;
            for (let o = 0; o < O; o++) out[oo + o] += a * wt[wo + o];
          }
        }
      }
    }
    return out;
  }

  _mlp(prefix, x, M, nLayers, sigmoid) {
    for (let i = 0; i < nLayers; i++) {
      x = this._linear(`${prefix}/layers/${i}`, x, M);
      if (i < nLayers - 1) reluInPlace(x);
    }
    if (sigmoid) for (let i = 0; i < x.length; i++) x[i] = 1 / (1 + Math.exp(-x[i]));
    return x;
  }

  /* embedding: Float32Array (eh*ew*C) NHWC; clicks in the input frame.
   * Returns {lowRes: Float32Array(4eh*4ew) mask-0 logits, iou: number}.
   * (models/mask_decoder.py predict_masks; multimask_output=false picks
   * mask token 0, matching demo/server.py.) */
  decode(embedding, clicks) {
    const cfg = this.cfg, C = cfg.embed_dim;
    const [eh, ew] = cfg.embedding_size, NK = eh * ew;
    const nm = cfg.num_mask_tokens;

    const pts = this._embedPoints(clicks);
    const T = 1 + nm + pts.rows;
    const tokens = new Float32Array(T * C);
    tokens.set(this.t['mask_decoder/iou_token'], 0);
    tokens.set(this.t['mask_decoder/mask_tokens'], C);
    tokens.set(pts, (1 + nm) * C);

    let keys = Float32Array.from(embedding);
    addRowInPlace(keys, NK, C, this.t['prompt_encoder/no_mask_embed']);
    const keyPE = this.densePE;
    let queries = tokens;
    const queryPE = Float32Array.from(tokens);

    for (let i = 0; i < cfg.depth; i++) {
      [queries, keys] = this._block(`mask_decoder/transformer/layers/${i}`,
                                    queries, T, keys, NK, queryPE, keyPE,
                                    i === 0);
    }
    const q = addInPlace(queries.slice(), queryPE);
    const k = addInPlace(keys.slice(), keyPE);
    addInPlace(queries, this._attention('mask_decoder/transformer/final_attn',
                                        q, T, k, NK, keys));
    queries = this._norm('mask_decoder/transformer/norm_final', queries, T,
                         cfg.ln_eps);

    // upscaling (mask_decoder.py:105-120)
    let x = this._convT2(keys, eh, ew,
                         this.t['mask_decoder/output_upscaling/convt1/w'],
                         this.t['mask_decoder/output_upscaling/convt1/b']);
    const C4 = C / 4;
    x = layerNorm(x, 4 * NK, C4,
                  this.t['mask_decoder/output_upscaling/ln/w'],
                  this.t['mask_decoder/output_upscaling/ln/b'],
                  cfg.ln_eps_decoder);
    geluInPlace(x);
    x = this._convT2(x, 2 * eh, 2 * ew,
                     this.t['mask_decoder/output_upscaling/convt2/w'],
                     this.t['mask_decoder/output_upscaling/convt2/b']);
    geluInPlace(x);  // (4eh * 4ew, C/8)
    const C8 = C / 8, NP = 16 * NK;

    // hypernetwork for mask token 0 (multimask_output=false) + IoU head
    const mask0 = queries.slice(C, 2 * C);
    const hyper = this._mlp('mask_decoder/hypernetworks/0', mask0, 1, 3, false);
    const lowRes = new Float32Array(NP);
    for (let p = 0; p < NP; p++) {
      const o = p * C8;
      let s = 0;
      for (let j = 0; j < C8; j++) s += hyper[j] * x[o + j];
      lowRes[p] = s;
    }
    const iou = this._mlp('mask_decoder/iou_head', queries.slice(0, C), 1,
                          3, false);
    return { lowRes, size: 4 * eh, iou: iou[0] };
  }
}

async function load(manifestUrl, blobUrl) {
  const [m, b] = await Promise.all([
    fetch(manifestUrl).then(r => r.json()),
    fetch(blobUrl).then(r => r.arrayBuffer()),
  ]);
  return new Decoder(m, b);
}

return { load, Decoder };
})();
