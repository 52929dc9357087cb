"""Qwen2 / Qwen2.5 decoder-only LM, TPU-first.

Architecture reference (golden-tested): [hf] models/qwen2/modeling_qwen2.py
(MLP :34-48, RoPE :50-83, attention :122-186 with q/k/v bias and bias-free o_proj
:135-138, RMSNorm :187-205, layer :207-254, model :310-402, CausalLM :403-477).

Design deltas (intentional, TPU-first):
- pure pytree params, scan-stacked layers executed with jax.lax.scan;
- a fixed-capacity StaticCache-style KV cache ([hf] cache_utils.py:1031 semantics) is the
  ONLY cache: prefill and decode both write at a static-shape slice offset, so a single
  compiled executable serves every step;
- forward takes input embeddings (not ids) so audio prefix tokens scatter in upstream
  ([hf] models/qwen2_audio/modeling_qwen2_audio.py:834-837 behavior lives in models/af3.py);
- masks are boolean and computed from positions, no -inf additive mask materialization
  until inside the attention op.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import Qwen2Config
from audio_flamingo_tpu.ops import apply_rope, gqa_attention, rms_norm, rope_cos_sin, swiglu_mlp


class KVCache(NamedTuple):
    """Static-shape KV cache: slot s holds absolute position s (contiguous fill)."""

    k: jnp.ndarray      # [num_layers, batch, capacity, num_kv_heads, head_dim]
    v: jnp.ndarray      # same
    index: jnp.ndarray  # scalar int32: number of filled slots

    @property
    def capacity(self) -> int:
        return self.k.shape[2]


def init_cache(cfg: Qwen2Config, batch: int, capacity: int,
               dtype: jnp.dtype = jnp.bfloat16) -> KVCache:
    hd = cfg.resolved_head_dim()
    shape = (cfg.num_layers, batch, capacity, cfg.num_kv_heads, hd)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   index=jnp.zeros((), jnp.int32))


class Q8KVCache(NamedTuple):
    """int8-quantized KV cache: per-(position, head) scales.

    Halves cache HBM bytes vs bf16 — the enabler for long-context, high-batch serving
    on one chip (e.g. 7B int8 weights + batch-32 x 8k-context cache inside 16 GB).
    Drop-in for KVCache in `forward` (dispatch on type).
    """

    k_q: jnp.ndarray      # [L, B, C, nkv, hd] int8
    v_q: jnp.ndarray
    k_scale: jnp.ndarray  # [L, B, C, nkv] f32
    v_scale: jnp.ndarray
    index: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.k_q.shape[2]


def init_cache_q8(cfg: Qwen2Config, batch: int, capacity: int) -> Q8KVCache:
    hd = cfg.resolved_head_dim()
    shape = (cfg.num_layers, batch, capacity, cfg.num_kv_heads, hd)
    sshape = shape[:-1]
    return Q8KVCache(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                     jnp.ones(sshape, jnp.float32), jnp.ones(sshape, jnp.float32),
                     jnp.zeros((), jnp.int32))


def _quantize_kv(x: jnp.ndarray):
    """[B, s, nkv, hd] -> (int8 values, f32 scales [B, s, nkv])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def _linear_init(rng, d_in, d_out, bias):
    scale = d_in ** -0.5
    p = {"w": jax.random.normal(rng, (d_in, d_out), jnp.float32) * scale * 0.5}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _layer_init(rng, cfg: Qwen2Config):
    d, f = cfg.hidden_size, cfg.intermediate_size
    hd = cfg.resolved_head_dim()
    keys = jax.random.split(rng, 7)
    return {
        "ln1_w": jnp.ones((d,)),
        "q": _linear_init(keys[0], d, cfg.num_heads * hd, cfg.attention_bias),
        "k": _linear_init(keys[1], d, cfg.num_kv_heads * hd, cfg.attention_bias),
        "v": _linear_init(keys[2], d, cfg.num_kv_heads * hd, cfg.attention_bias),
        "o": _linear_init(keys[3], cfg.num_heads * hd, d, False),
        "ln2_w": jnp.ones((d,)),
        "mlp": {"gate": _linear_init(keys[4], d, f, False)["w"],
                "up": _linear_init(keys[5], d, f, False)["w"],
                "down": _linear_init(keys[6], f, d, False)["w"]},
    }


def init(rng: jax.Array, cfg: Qwen2Config) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 2)
    layers = [_layer_init(k, cfg) for k in keys[: cfg.num_layers]]
    params = {
        "embed": jax.random.normal(keys[-1], (cfg.vocab_size, cfg.hidden_size),
                                   jnp.float32) * 0.02,
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "ln_f_w": jnp.ones((cfg.hidden_size,)),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jax.random.normal(keys[-2], (cfg.hidden_size, cfg.vocab_size),
                                              jnp.float32) * 0.02
    return params


def _linear(x, p, a8: bool = False):
    if "w_p" in p:  # int4 weight-only path (ops/quant4.py); a8 has no int4 win
        from audio_flamingo_tpu.ops.quant4 import q4_matmul

        y = q4_matmul(x, p)
    elif "w_q" in p:  # int8 weight-only path (ops/quant.py)
        from audio_flamingo_tpu.ops.quant import q_matmul, q_matmul_a8

        y = q_matmul_a8(x, p) if a8 else q_matmul(x, p)
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
    if "lora_a" in p:  # LoRA/QLoRA adapters (ops/lora.py): y += (x a) b * s
        from audio_flamingo_tpu.ops.lora import lora_delta

        y = y + lora_delta(x, p).astype(y.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _linear_shared_a8(xq_xs, x, p):
    """_linear for consumers sharing one pre-quantized activation (a8 prefill).

    xq_xs: (x_q, x_scale) from ops.quant.quantize_act — q/k/v share the ln1
    output and gate/up the ln2 output, so the ~0.7 ms/[15k,d] quant sweep runs
    once instead of per-projection. Falls back to bf16 when p is unquantized
    and to the int4 path when the layer is w4-packed (no w4a8 MXU mode)."""
    if "w_q" not in p:
        return _linear(x, p)
    from audio_flamingo_tpu.ops.quant import q_matmul_a8q

    y = q_matmul_a8q(*xq_xs, p, out_dtype=x.dtype)
    if "lora_a" in p:  # adapters apply on the a8 fast path too (ops/lora.py)
        from audio_flamingo_tpu.ops.lora import lora_delta

        y = y + lora_delta(x, p).astype(y.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _prefill_flash(q, k, v, cfg):
    """Fresh-prefill flash attention; cfg.a8_attention routes to the int8-QK kernel
    (tolerance-band — ops/pallas/flash_attention_a8 docstring)."""
    if cfg.a8_attention:
        from audio_flamingo_tpu.ops.pallas.flash_attention_a8 import flash_attention_a8

        return flash_attention_a8(q, k, v, causal=True)
    from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention

    return flash_attention(q, k, v, causal=True)


def _layer_forward(x, lp, cfg: Qwen2Config, cos, sin, mask, cache_kv=None, cache_index=None,
                   flash_ok: bool = False, stacked=None, layer_idx=None):
    """One decoder block. Returns (x, (new_k, new_v)) where new_k/v are this step's KV.

    If cache_kv=(ck, cv) is given, attention runs against the cache with this step's KV
    written at cache_index; otherwise against the step's own KV (pure prefill, no cache).
    flash_ok (STATIC): caller certifies the flash fast path is semantically valid for
    this call — multi-token block, purely-causal mask (no extra_mask, no sliding
    window), and if a cache is present the block IS the whole attendable context
    (fresh prefill at index 0). A warm cache (e.g. speculative verify of k+1 tokens,
    runtime/speculative.py) must NOT set it: flash over only the new block would
    ignore every cached prompt KV.
    stacked/layer_idx: the fused-w4 decode path (ops/quant4.py fuse=True). `stacked`
    holds the LAYER-STACKED packed dicts (qkv / o / mlp.gateup / mlp.down) captured
    OUTSIDE the layer scan; `layer_idx` selects the layer inside the Pallas kernel's
    BlockSpec maps, so the scan never materializes per-layer weight slices.
    """
    b, s, d = x.shape
    nh, nkv = cfg.num_heads, cfg.num_kv_heads
    hd = cfg.resolved_head_dim()
    a8 = cfg.a8_prefill and s > 1   # w8a8 on compute-bound multi-token forwards only

    h = rms_norm(x, lp["ln1_w"], cfg.rms_norm_eps)
    if stacked is not None and "qkv" in stacked:
        from audio_flamingo_tpu.ops.quant4 import q4_matmul_stacked

        y = q4_matmul_stacked(h, stacked["qkv"], layer_idx)
        q = y[..., : nh * hd].reshape(b, s, nh, hd)
        k = y[..., nh * hd: (nh + nkv) * hd].reshape(b, s, nkv, hd)
        v = y[..., (nh + nkv) * hd:].reshape(b, s, nkv, hd)
    elif a8 and "w_q" in lp["q"]:
        from audio_flamingo_tpu.ops.quant import quantize_act

        hq = quantize_act(h)   # one quant sweep shared by q/k/v
        q = _linear_shared_a8(hq, h, lp["q"]).reshape(b, s, nh, hd)
        k = _linear_shared_a8(hq, h, lp["k"]).reshape(b, s, nkv, hd)
        v = _linear_shared_a8(hq, h, lp["v"]).reshape(b, s, nkv, hd)
    else:
        q = _linear(h, lp["q"], a8=a8).reshape(b, s, nh, hd)
        k = _linear(h, lp["k"], a8=a8).reshape(b, s, nkv, hd)
        v = _linear(h, lp["v"], a8=a8).reshape(b, s, nkv, hd)
    q, k = apply_rope(q, k, cos, sin)

    use_flash_prefill = flash_ok and s > 1
    if cache_kv is not None and len(cache_kv) == 4:
        # int8 KV cache: quantize this step's KV, dequantize the cache for attention
        ck, cv, ks, vs = cache_kv
        kq, ksc = _quantize_kv(k)
        vq, vsc = _quantize_kv(v)
        ck = jax.lax.dynamic_update_slice(ck, kq, (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, vq, (0, cache_index, 0, 0))
        ks = jax.lax.dynamic_update_slice(ks, ksc, (0, cache_index, 0))
        vs = jax.lax.dynamic_update_slice(vs, vsc, (0, cache_index, 0))
        if use_flash_prefill:
            attn = _prefill_flash(q, k, v, cfg)
        else:
            # scale-folded attention on the raw int8 cache — no dequantized
            # [B, C, nkv, hd] copy per layer (ops/attention.gqa_attention_q8)
            from audio_flamingo_tpu.ops.attention import gqa_attention_q8

            attn = gqa_attention_q8(q, ck, cv, ks, vs, mask=mask)
        new_kv = (ck, cv, ks, vs)
    elif cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
        if use_flash_prefill:
            # fresh-prefill fast path (flash_ok certifies cache.index == 0, so this
            # block's own KV is the whole attendable context)
            attn = _prefill_flash(q, k, v, cfg)
        else:
            attn = gqa_attention(q, ck.astype(q.dtype), cv.astype(q.dtype), mask=mask)
        new_kv = (ck, cv)
    else:
        if use_flash_prefill:
            attn = _prefill_flash(q, k, v, cfg)
        else:
            attn = gqa_attention(q, k, v, mask=mask)
        new_kv = None
    attn2d = attn.reshape(b, s, nh * hd)
    if stacked is not None and "o" in stacked:
        from audio_flamingo_tpu.ops.quant4 import q4_matmul_stacked

        x = x + q4_matmul_stacked(attn2d, stacked["o"], layer_idx)
    else:
        x = x + _linear(attn2d, lp["o"], a8=a8)

    h = rms_norm(x, lp["ln2_w"], cfg.rms_norm_eps)
    mlp_stacked = stacked.get("mlp") if stacked is not None else None
    if mlp_stacked is not None and "gateup" in mlp_stacked:
        from audio_flamingo_tpu.ops.quant4 import q4_matmul_stacked

        f = cfg.intermediate_size
        gu = q4_matmul_stacked(h, mlp_stacked["gateup"], layer_idx)
        act = jax.nn.silu(gu[..., :f]) * gu[..., f:]
        if "down" in mlp_stacked:
            x = x + q4_matmul_stacked(act, mlp_stacked["down"], layer_idx)
        else:
            x = x + _linear(act, lp["mlp"]["down"])
        return x, new_kv
    mlp = lp["mlp"]
    if isinstance(mlp["gate"], dict):  # quantized MLP (int8 w_q or int4 w_p)
        if a8 and "w_q" in mlp["gate"]:
            from audio_flamingo_tpu.ops.quant import quantize_act

            hq = quantize_act(h)   # one quant sweep shared by gate/up
            act = (jax.nn.silu(_linear_shared_a8(hq, h, mlp["gate"]))
                   * _linear_shared_a8(hq, h, mlp["up"]))
            x = x + _linear(act, mlp["down"], a8=True)  # lora-aware a8 matmul
        else:
            # per-matrix dispatch: a w4 tree may carry int8 fallbacks for
            # group-unaligned shapes, so route each linear independently
            act = jax.nn.silu(_linear(h, mlp["gate"])) * _linear(h, mlp["up"])
            x = x + _linear(act, mlp["down"])
    else:
        x = x + swiglu_mlp(h, {k2: w.astype(x.dtype) for k2, w in mlp.items()})
    return x, new_kv


def qkv_proj(hn, lp, cfg: Qwen2Config, stacked=None, layer_idx=None):
    """q/k/v projections under every weight layout (bf16 'w' / int8 'w_q' /
    int4 'w_p' / fused-stacked 'qkv') — shared by the model layer and the
    engines' decode bodies. Returns ([B,s,nh,hd], [B,s,nkv,hd], [B,s,nkv,hd])."""
    b, s, _ = hn.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.resolved_head_dim()
    if stacked is not None and "qkv" in stacked:
        from audio_flamingo_tpu.ops.quant4 import q4_matmul_stacked

        y = q4_matmul_stacked(hn, stacked["qkv"], layer_idx)
        q, k, v = (y[..., : nh * hd], y[..., nh * hd: (nh + nkv) * hd],
                   y[..., (nh + nkv) * hd:])
    else:
        q, k, v = _linear(hn, lp["q"]), _linear(hn, lp["k"]), _linear(hn, lp["v"])
    return (q.reshape(b, s, nh, hd), k.reshape(b, s, nkv, hd),
            v.reshape(b, s, nkv, hd))


def o_proj(attn2d, lp, stacked=None, layer_idx=None):
    if stacked is not None and "o" in stacked:
        from audio_flamingo_tpu.ops.quant4 import q4_matmul_stacked

        return q4_matmul_stacked(attn2d, stacked["o"], layer_idx)
    return _linear(attn2d, lp["o"])


def mlp_forward(hn, lp, cfg: Qwen2Config, stacked=None, layer_idx=None):
    """SwiGLU MLP under every weight layout (see qkv_proj)."""
    ms = stacked.get("mlp") if stacked is not None else None
    if ms is not None and "gateup" in ms:
        from audio_flamingo_tpu.ops.quant4 import q4_matmul_stacked

        f = cfg.intermediate_size
        gu = q4_matmul_stacked(hn, ms["gateup"], layer_idx)
        act = jax.nn.silu(gu[..., :f]) * gu[..., f:]
        if "down" in ms:
            return q4_matmul_stacked(act, ms["down"], layer_idx)
        return _linear(act, lp["mlp"]["down"])
    mlp = lp["mlp"]
    if isinstance(mlp["gate"], dict):
        act = jax.nn.silu(_linear(hn, mlp["gate"])) * _linear(hn, mlp["up"])
        return _linear(act, mlp["down"])
    return swiglu_mlp(hn, {k2: w.astype(hn.dtype) for k2, w in mlp.items()})


def split_stacked_w4(layers: dict):
    """Fused-w4 trees (ops/quant4.py fuse=True): separate the layer-STACKED packed
    weight dicts (consumed whole by the scalar-prefetch kernel, indexed per layer
    inside its BlockSpec maps) from the small per-layer leaves that lax.scan
    slices. A scan-sliced pallas operand materializes a copy of every layer's
    weights each step (~3.5 GB at 7B decode — measured, scripts/profile_w4c.py),
    which this split avoids entirely. Returns (stacked_or_None, scanned)."""
    if "qkv" not in layers:
        return None, layers
    big, small = {}, {}
    for k, v in layers.items():
        if k == "mlp":
            bm, sm = {}, {}
            for mk, mv in v.items():
                if isinstance(mv, dict) and "w_p" in mv:
                    bm[mk] = mv
                else:
                    sm[mk] = mv
            if bm:
                big["mlp"] = bm
            if sm:
                small["mlp"] = sm
        elif isinstance(v, dict) and "w_p" in v:
            big[k] = v
        else:
            small[k] = v
    return (big or None), small


def embed(params: dict, token_ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    emb = params["embed"]
    if isinstance(emb, dict):  # int8 per-row quantized embedding
        rows = emb["w_q"][token_ids].astype(jnp.float32)
        return (rows * emb["scale"][token_ids][..., None]).astype(dtype)
    return emb.astype(dtype)[token_ids]


def unembed(params: dict, cfg: Qwen2Config, hidden: jnp.ndarray) -> jnp.ndarray:
    """hidden -> logits (fp32), tied or untied head; int8-aware."""
    h = hidden.astype(jnp.float32)
    if cfg.tie_word_embeddings:
        emb = params["embed"]
        if isinstance(emb, dict):
            logits = jax.lax.dot_general(h, emb["w_q"].astype(jnp.float32),
                                         (((h.ndim - 1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            return logits * emb["scale"][None].astype(jnp.float32)
        return jnp.dot(h, emb.T.astype(jnp.float32), preferred_element_type=jnp.float32)
    head = params["lm_head"]
    if isinstance(head, dict) and "w_p" in head:
        from audio_flamingo_tpu.ops.quant4 import q4_matmul

        return q4_matmul(h, head).astype(jnp.float32)
    if isinstance(head, dict):
        from audio_flamingo_tpu.ops.quant import q_matmul

        return q_matmul(h, head).astype(jnp.float32)
    return jnp.dot(h, head.astype(jnp.float32), preferred_element_type=jnp.float32)


def forward(params: dict, cfg: Qwen2Config, embeds: jnp.ndarray, positions: jnp.ndarray,
            cache: KVCache | None = None, extra_mask: jnp.ndarray | None = None,
            is_prefill: bool = False):
    """Run the decoder stack on input embeddings.

    embeds: [batch, seq, hidden]; positions: [batch, seq] absolute positions.
    cache: if provided, this step's KV is written at cache.index and attention spans the
      cache (causal by absolute position). Returns (hidden, new_cache).
    extra_mask: optional [batch, 1, seq, kv_len] boolean AND-ed onto the causal mask
      (padding / media masking).
    is_prefill (STATIC): caller certifies cache.index == 0 (a fresh prefill), enabling
      the flash fast path over the block's own KV. Multi-token forwards against a WARM
      cache (speculative verify) must leave this False or flash would drop cached KV.
    """
    b, s, _ = embeds.shape
    hd = cfg.resolved_head_dim()
    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta, dtype=jnp.float32)

    # Per-layer sliding-window gating ([hf] configuration_qwen2.py:204-207): layer i
    # slides iff sliding_window is set AND i >= max_window_layers. When any layer
    # slides, both masks are built and scan selects per layer.
    sliding_layers = (cfg.sliding_window is not None
                      and cfg.max_window_layers < cfg.num_layers)
    if cache is not None:
        kv_len = cache.capacity
        kv_pos = jnp.arange(kv_len)[None, None, None, :]
        mask = kv_pos <= positions[:, None, :, None]  # causal by absolute position
        # slots >= filled+new are invalid (zeros); they are also > positions, so the causal
        # test already excludes them as long as slot == absolute position (contiguous fill).
        if sliding_layers:
            sw_mask = jnp.logical_and(
                mask, kv_pos > positions[:, None, :, None] - cfg.sliding_window)
    else:
        kv_len = s
        mask = positions[:, None, :, None] >= positions[:, None, None, :]
        if sliding_layers:
            sw_mask = jnp.logical_and(
                mask,
                positions[:, None, None, :] > positions[:, None, :, None] - cfg.sliding_window)
    if extra_mask is not None:
        mask = jnp.logical_and(mask, extra_mask)
        if sliding_layers:
            sw_mask = jnp.logical_and(sw_mask, extra_mask)

    # Flash requires a purely-causal full-attention context: no extra mask, no sliding
    # layers, and (with a cache) a provably-fresh prefill.
    flash_ok = (cfg.use_flash and extra_mask is None and not sliding_layers
                and (cache is None or is_prefill))
    if sliding_layers:
        layer_slides = jnp.arange(cfg.num_layers) >= cfg.max_window_layers
    else:
        layer_slides = jnp.zeros((cfg.num_layers,), bool)

    def pick_mask(slides):
        return jnp.where(slides, sw_mask, mask) if sliding_layers else mask

    x = embeds
    stacked, scan_layers = split_stacked_w4(params["layers"])
    idxs = jnp.arange(cfg.num_layers)

    # 2-call-per-layer fused decode (ops/pallas/quant4_block.py): each suffix-B
    # kernel also computes the NEXT layer's qkv, so a decode token pays exactly
    # 2 pallas launches per layer (~27 us fixed each on this backend)
    use_suffix = False
    if stacked is not None and cache is not None and s == 1 and b <= 8 \
            and not sliding_layers:
        from audio_flamingo_tpu.ops.pallas.quant4_block import suffix_supported

        use_suffix = suffix_supported(stacked, cfg)
    if use_suffix:
        return _forward_w4_suffix(params, cfg, x, cache, mask, cos, sin,
                                  stacked, scan_layers, idxs)

    if isinstance(cache, Q8KVCache):
        def body(carry, xs):
            h = carry
            lp, idx, ck, cv, ks, vs, slides = xs
            h, new = _layer_forward(h, lp, cfg, cos, sin, pick_mask(slides),
                                    cache_kv=(ck, cv, ks, vs), cache_index=cache.index,
                                    flash_ok=flash_ok, stacked=stacked, layer_idx=idx)
            return h, new

        x, (nk, nv, nks, nvs) = jax.lax.scan(
            body, x, (scan_layers, idxs, cache.k_q, cache.v_q, cache.k_scale,
                      cache.v_scale, layer_slides))
        new_cache = Q8KVCache(nk, nv, nks, nvs, cache.index + s)
    elif cache is not None:
        def body(carry, xs):
            h = carry
            lp, idx, ck, cv, slides = xs
            h, (nk, nv) = _layer_forward(h, lp, cfg, cos, sin, pick_mask(slides),
                                         cache_kv=(ck, cv), cache_index=cache.index,
                                         flash_ok=flash_ok, stacked=stacked,
                                         layer_idx=idx)
            return h, (nk, nv)

        x, (new_k, new_v) = jax.lax.scan(
            body, x, (scan_layers, idxs, cache.k, cache.v, layer_slides))
        new_cache = KVCache(k=new_k, v=new_v, index=cache.index + s)
    else:
        def body(carry, xs):
            lp, idx, slides = xs
            h, _ = _layer_forward(carry, lp, cfg, cos, sin, pick_mask(slides),
                                  flash_ok=flash_ok, stacked=stacked, layer_idx=idx)
            return h, None

        # cache-free forward is the training path: apply the activation-recompute
        # policy here so backward saves O(1) layers instead of O(L) (ops/remat.py)
        from audio_flamingo_tpu.ops.remat import remat_wrap

        x, _ = jax.lax.scan(remat_wrap(body, cfg.remat),
                            x, (scan_layers, idxs, layer_slides))
        new_cache = None

    x = rms_norm(x, params["ln_f_w"], cfg.rms_norm_eps)
    return x, new_cache


def w4_suffix_seed(params, cfg: Qwen2Config, stacked, x) -> jnp.ndarray:
    """Layer-0 input norm + fused qkv [B, s, n_qkv] that seeds the 2-call
    suffix decode scan (every later layer's qkv comes from the previous
    layer's suffix-B kernel)."""
    from audio_flamingo_tpu.ops.quant4 import q4_matmul_stacked

    hn0 = rms_norm(x, params["layers"]["ln1_w"][0], cfg.rms_norm_eps)
    return q4_matmul_stacked(hn0, stacked["qkv"], jnp.int32(0))  # bias included


def w4_suffix_layer_step(h, y, lp, idx, *, cfg: Qwen2Config, stacked, ln1_full,
                         qkv_bias, cos, sin, attend):
    """One layer of the fused 2-pallas-call w4 decode body (s == 1).

    Shared by qwen2._forward_w4_suffix, runtime/engine._rows_forward and
    runtime/paged_cache.paged_decode_step — only the cache write + attention
    read differ, supplied as `attend(q, k, v) -> (attn [B,s,nh,hd], new_kv)`.
    Consumes this layer's precomputed qkv `y` [B, s, n_qkv], runs suffix-A
    (o + residual + rms + gate|up + act) and suffix-B (down + residual +
    next-norm + NEXT layer's qkv); returns ((h2, y_next), new_kv)."""
    from audio_flamingo_tpu.ops.pallas.quant4_block import (w4_suffix_a,
                                                            w4_suffix_b)

    b, s, d = h.shape
    nh, nkv = cfg.num_heads, cfg.num_kv_heads
    hd = cfg.resolved_head_dim()
    eps = cfg.rms_norm_eps
    q = y[..., : nh * hd].reshape(b, s, nh, hd)
    k = y[..., nh * hd: (nh + nkv) * hd].reshape(b, s, nkv, hd)
    v = y[..., (nh + nkv) * hd:].reshape(b, s, nkv, hd)
    q, k = apply_rope(q, k, cos, sin)
    attn, new_kv = attend(q, k, v)
    attn2d = attn.reshape(b, nh * hd).astype(h.dtype)
    act, h_mid = w4_suffix_a(attn2d, h.reshape(b, d), lp["ln2_w"],
                             stacked["o"], stacked["mlp"]["gateup"], idx,
                             eps=eps)
    nxt = jnp.minimum(idx + 1, cfg.num_layers - 1)
    ln1_next = jax.lax.dynamic_index_in_dim(ln1_full, nxt, 0, keepdims=False)
    h2, y_next = w4_suffix_b(act, h_mid, ln1_next, stacked["mlp"]["down"],
                             stacked["qkv"], idx, nxt, eps=eps)
    if qkv_bias is not None:
        y_next = y_next + jax.lax.dynamic_index_in_dim(
            qkv_bias, nxt, 0, keepdims=False).astype(y_next.dtype)
    return (h2.reshape(b, s, d), y_next[:, None, :]), new_kv


def _forward_w4_suffix(params, cfg: Qwen2Config, x, cache, mask, cos, sin,
                       stacked, scan_layers, idxs):
    """Decode forward on a fused-w4 tree at 2 pallas_calls per layer.

    Layer i's input norm + qkv were computed by layer i-1's suffix-B kernel
    (seeded by one standalone stacked-qkv call for layer 0); the scan body runs
    attention in XLA (scale-folded int8 or bf16 cache), then suffix-A
    (o + residual + rms + gate|up + act) and suffix-B (down + residual +
    next-norm + next-qkv). See ops/pallas/quant4_block.py for the call-cost
    rationale. Decode-only: s == 1, no sliding windows, cache present.
    """
    from audio_flamingo_tpu.ops.attention import gqa_attention_q8

    s = x.shape[1]
    quantized = isinstance(cache, Q8KVCache)
    ln1_full = params["layers"]["ln1_w"]                  # [L, d]
    qkv_bias = stacked["qkv"].get("b")                    # [L, n_qkv] or None
    y = w4_suffix_seed(params, cfg, stacked, x)

    def body(carry, xs):
        h, y = carry
        if quantized:
            lp, idx, ck, cv, ks, vs = xs
        else:
            lp, idx, ck, cv = xs

        def attend(q, k, v):
            if quantized:
                kq, ksc = _quantize_kv(k)
                vq, vsc = _quantize_kv(v)
                ck2 = jax.lax.dynamic_update_slice(ck, kq, (0, cache.index, 0, 0))
                cv2 = jax.lax.dynamic_update_slice(cv, vq, (0, cache.index, 0, 0))
                ks2 = jax.lax.dynamic_update_slice(ks, ksc, (0, cache.index, 0))
                vs2 = jax.lax.dynamic_update_slice(vs, vsc, (0, cache.index, 0))
                return (gqa_attention_q8(q, ck2, cv2, ks2, vs2, mask=mask),
                        (ck2, cv2, ks2, vs2))
            ck2 = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                               (0, cache.index, 0, 0))
            cv2 = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                               (0, cache.index, 0, 0))
            return (gqa_attention(q, ck2.astype(q.dtype), cv2.astype(q.dtype),
                                  mask=mask), (ck2, cv2))

        return w4_suffix_layer_step(h, y, lp, idx, cfg=cfg, stacked=stacked,
                                    ln1_full=ln1_full, qkv_bias=qkv_bias,
                                    cos=cos, sin=sin, attend=attend)

    if quantized:
        xs = (scan_layers, idxs, cache.k_q, cache.v_q, cache.k_scale,
              cache.v_scale)
        (x, _), (nk, nv, nks, nvs) = jax.lax.scan(body, (x, y), xs)
        new_cache = Q8KVCache(nk, nv, nks, nvs, cache.index + s)
    else:
        (x, _), (nk, nv) = jax.lax.scan(
            body, (x, y), (scan_layers, idxs, cache.k, cache.v))
        new_cache = KVCache(k=nk, v=nv, index=cache.index + s)
    x = rms_norm(x, params["ln_f_w"], cfg.rms_norm_eps)
    return x, new_cache


def forward_sp(params: dict, cfg: Qwen2Config, embeds: jnp.ndarray,
               positions: jnp.ndarray, mesh, axis: str = "model",
               attn_impl: str = "ring") -> jnp.ndarray:
    """Sequence-parallel training forward: activations sharded on the SEQUENCE axis over
    `axis`; self-attention runs as ring attention (ppermute KV rotation) so no device
    ever holds the full T x T score matrix or full-sequence KV (SURVEY.md §2.9 SP row,
    context-extension training for 10-min/full-song inputs).

    No cache (training only). Linears/norms are token-local and shard trivially; RoPE
    uses the global `positions`, so each shard rotates with its absolute offsets.
    attn_impl: "ring" (ppermute KV rotation, O(T/sp) memory) or "ulysses" (all_to_all
    on heads; requires num_heads % sp == 0, KV heads are GQA-expanded if needed).

    Structure: ONE shard_map over the whole stack with a `lax.scan` over layer params
    inside — trace/compile size is O(1) in depth (round-1 used a Python layer loop with
    one nested shard_map per layer: O(L) trace, unusable at 28-32 layers). Params enter
    the shard_map as replicated ARGUMENTS (never closed over — they would become compile
    constants), so gradients flow and are psummed by shard_map's AD.
    """
    from jax.sharding import PartitionSpec as P

    from audio_flamingo_tpu.parallel.sequence import (ring_attention_local,
                                                      ulysses_attention_local)

    assert attn_impl in ("ring", "ulysses")
    hd = cfg.resolved_head_dim()
    attn_local = ring_attention_local if attn_impl == "ring" else ulysses_attention_local

    def stack(x, pos, layers, ln_f_w):
        cos, sin = rope_cos_sin(pos, hd, cfg.rope_theta, dtype=jnp.float32)

        def body(h, lp):
            bb, ss, _ = h.shape
            hn = rms_norm(h, lp["ln1_w"], cfg.rms_norm_eps)
            q = _linear(hn, lp["q"]).reshape(bb, ss, cfg.num_heads, hd)
            k = _linear(hn, lp["k"]).reshape(bb, ss, cfg.num_kv_heads, hd)
            v = _linear(hn, lp["v"]).reshape(bb, ss, cfg.num_kv_heads, hd)
            q, k = apply_rope(q, k, cos, sin)
            attn = attn_local(q, k, v, axis, causal=True)
            h = h + _linear(attn.reshape(bb, ss, cfg.num_heads * hd), lp["o"])
            hn = rms_norm(h, lp["ln2_w"], cfg.rms_norm_eps)
            h = h + swiglu_mlp(hn, {k2: w.astype(h.dtype) for k2, w in lp["mlp"].items()})
            return h, None

        from audio_flamingo_tpu.ops.remat import remat_wrap

        x, _ = jax.lax.scan(remat_wrap(body, cfg.remat), x, layers)
        return rms_norm(x, ln_f_w, cfg.rms_norm_eps)

    # batch stays sharded over the non-SP mesh axes (DP x SP composition: e.g. batch
    # over ("data","fsdp"), sequence over "model")
    other = tuple(n for n in mesh.axis_names if n != axis)
    bspec = other if other else None
    seq_spec = P(bspec, axis, None)
    pos_spec = P(bspec, axis)
    layer_specs = jax.tree.map(lambda _: P(), params["layers"])
    # ring runs the Pallas flash kernel per block (interpret-mode on CPU), which
    # trips shard_map's vma checker under lax.switch — disable the check there
    # (jax's own suggested workaround; ring==dense parity tests gate numerics)
    return jax.shard_map(
        stack, mesh=mesh,
        in_specs=(seq_spec, pos_spec, layer_specs, P()),
        out_specs=seq_spec, check_vma=(attn_impl != "ring"),
    )(embeds, positions, params["layers"], params["ln_f_w"])


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def logits_from_ids(params: dict, cfg: Qwen2Config, token_ids: jnp.ndarray,
                    compute_dtype=jnp.float32) -> jnp.ndarray:
    """Convenience full-sequence forward (no cache): [B, T] ids -> [B, T, vocab] fp32."""
    b, t = token_ids.shape
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    x = embed(params, token_ids, compute_dtype)
    h, _ = forward(params, cfg, x, pos)
    return unembed(params, cfg, h)
