"""Weight-only int4 quantization (w4a16, group-wise scales) for the decode path.

Decode streams every weight byte once per token, so at batch 1 the tokens/s ceiling is
HBM bytes / weight bytes: bf16 7B ~14.2 GB (doesn't fit one v5e), int8 ~7.1 GB
(~95 tok/s measured), int4 ~3.6 GB — a further ~2x headroom. int4 per-channel is too
lossy, so scales are per GROUP of `group_size` input rows per output column (the
standard GPTQ/AWQ grouping, symmetric variant); activations stay bf16 and accumulate
f32 on the MXU.

Packing layout ("halves" packing, chosen so the Pallas kernel never interleaves):
for a [K, N] matrix the packed int8 array has K/2 rows where row i holds
w[i] in the LOW nibble and w[i + K/2] in the HIGH nibble. Unpacking is two
arithmetic shifts; the matmul becomes

    y = (x[:, :K/2] @ lo) * s_lo + (x[:, K/2:] @ hi) * s_hi

summed over group-sized K blocks — two MXU dots per block, no row shuffle. Both the
XLA fallback (ops below) and the Pallas kernel (ops/pallas/quant4_matmul.py) compute
exactly this.

Role parity: the reference lineage serves through HF/torch fp16/bf16 checkpoints
([hf] modeling_qwen2.py Qwen2ForCausalLM weights); low-bit decode is a beyond-reference
capability this framework adds for single-chip 7B serving (SURVEY.md §6 decode north
star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_GROUP = 128


def supports_w4(k: int, group_size: int = DEFAULT_GROUP) -> bool:
    """Halves packing + group alignment needs K/2 to divide into whole groups."""
    return k % (2 * group_size) == 0


def _sign_extend_low(p: jnp.ndarray) -> jnp.ndarray:
    """int8 packed -> low-nibble int4 values in int8 (-8..7)."""
    return jnp.int8(p << 4) >> 4


def _sign_extend_high(p: jnp.ndarray) -> jnp.ndarray:
    """int8 packed -> high-nibble int4 values in int8 (-8..7)."""
    return p >> 4


def pack_w4(w_q: jnp.ndarray) -> jnp.ndarray:
    """int (-8..7) [..., K, N] -> packed int8 [..., K/2, N] (halves layout)."""
    k = w_q.shape[-2]
    assert k % 2 == 0, k
    lo = w_q[..., : k // 2, :].astype(jnp.int8)
    hi = w_q[..., k // 2:, :].astype(jnp.int8)
    return jnp.int8((hi << 4) | (lo & 0x0F))


def unpack_w4(w_p: jnp.ndarray) -> jnp.ndarray:
    """packed int8 [..., K/2, N] -> int8 values (-8..7) [..., K, N]."""
    return jnp.concatenate([_sign_extend_low(w_p), _sign_extend_high(w_p)], axis=-2)


def quantize_linear_w4(w: jnp.ndarray, group_size: int = DEFAULT_GROUP) -> dict:
    """[K, N] (or stacked [L, K, N]) float -> {'w_p': int8 [.., K/2, N],
    'gscale': f32 [.., K/G, N]}.

    Symmetric per-(group, out-column): s = max|w_group| / 7, w_q = round(w/s) in
    [-7, 7] (the -8 code is unused so the grid is symmetric). The group size is
    NOT stored — it is derivable as K / gscale.shape[-2] and must stay a static
    Python int (a pytree leaf would turn traced under jit and break unpacking).
    """
    k, n = w.shape[-2], w.shape[-1]
    assert supports_w4(k, group_size), (k, group_size)
    lead = w.shape[:-2]
    wf = w.astype(jnp.float32).reshape(*lead, k // group_size, group_size, n)
    amax = jnp.max(jnp.abs(wf), axis=-2)                      # [.., K/G, N]
    gscale = jnp.maximum(amax, 1e-8) / 7.0
    w_q = jnp.clip(jnp.round(wf / gscale[..., None, :]), -7, 7)
    w_q = w_q.reshape(*lead, k, n).astype(jnp.int8)
    return {"w_p": pack_w4(w_q), "gscale": gscale}


def dequantize_w4(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """packed dict -> [.., K, N] float weights (fallback / test reference)."""
    w_q = unpack_w4(p["w_p"]).astype(jnp.float32)             # [.., K, N]
    g = w_q.shape[-2] // p["gscale"].shape[-2]                # static group size
    scale = jnp.repeat(p["gscale"], g, axis=-2)               # [.., K, N]
    return (w_q * scale).astype(dtype)


# decode-side row threshold: below this the Pallas streaming kernel wins (weights are
# the traffic); above it the matmul is compute-bound and the XLA dequant path keeps
# the MXU on large fused dots.
_PALLAS_MAX_ROWS = 256


def q4_matmul(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """[..., K] @ w4-packed [K, N] -> [..., N] in x.dtype.

    Decode shapes (few rows) ride the Pallas kernel that streams int4-packed bytes
    HBM->VMEM; larger shapes (prefill) dequantize into the XLA dot, which is fine
    because prefill is FLOP-bound and the bf16 weight re-materialization is noise.
    """
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    k = x.shape[-1]
    n = p["w_p"].shape[-1]
    x2 = x.reshape(m, k)
    if m <= _PALLAS_MAX_ROWS and n % min(512, n) == 0:
        from audio_flamingo_tpu.ops.pallas.quant4_matmul import w4a16_matmul

        y = w4a16_matmul(x2, p["w_p"], p["gscale"])
    else:
        w = dequantize_w4(p, dtype=x.dtype)
        y = jax.lax.dot_general(x2, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(x.dtype)
    return y.reshape(*lead, y.shape[-1])


def quantize_lm_params_w4(params: dict, group_size: int = DEFAULT_GROUP,
                          quantize_embed: bool = True, fuse: bool = True,
                          head_w4: bool = False) -> dict:
    """models/qwen2.py param pytree -> layer linears w4, embed/lm_head int8.

    The layer matmuls are ~97% of 7B weight bytes, so they carry the int4 win; the
    embedding (gathered per token) and lm_head (one [d, V] dot per step) stay on the
    int8 path, whose per-channel scales are lossless enough for logits. Linears whose
    K doesn't align to 2*group_size (tiny test configs) fall back to int8.

    fuse=True (and aligned shapes): q|k|v concatenate along the out dim into one
    'qkv' matrix and gate|up into 'gateup' — groups run along K and columns are
    independent, so the quantized values are BIT-IDENTICAL to separate quantization
    while halving the pallas_call count per layer (a ~27 us fixed cost per call on
    this backend dominates decode; scripts/profile_w4e.py).
    """
    from audio_flamingo_tpu.ops.quant import quantize_embedding, quantize_linear

    out = dict(params)
    layers = params["layers"]

    def quant(w):  # stacked [L, K, N]
        if supports_w4(w.shape[-2], group_size):
            return quantize_linear_w4(w, group_size)
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[:, None, :]), -127, 127)
        return {"w_q": w_q.astype(jnp.int8), "scale": scale}

    new_layers = {}
    fusable = fuse and supports_w4(layers["q"]["w"].shape[-2], group_size)
    if fusable:
        qkv_w = jnp.concatenate([layers[n]["w"] for n in ("q", "k", "v")], axis=-1)
        qkv = quantize_linear_w4(qkv_w, group_size)
        if "b" in layers["q"]:
            qkv["b"] = jnp.concatenate([layers[n]["b"] for n in ("q", "k", "v")],
                                       axis=-1)
        new_layers["qkv"] = qkv
        lin = dict(layers["o"])
        lin_q = quant(lin.pop("w"))
        lin.update(lin_q)
        new_layers["o"] = lin
        new_layers["mlp"] = {
            "gateup": quantize_linear_w4(
                jnp.concatenate([layers["mlp"]["gate"], layers["mlp"]["up"]],
                                axis=-1), group_size),
            "down": quant(layers["mlp"]["down"]),
        }
    else:
        for name in ("q", "k", "v", "o"):
            lin = dict(layers[name])
            lin_q = quant(lin.pop("w"))
            lin.update(lin_q)
            new_layers[name] = lin
        new_layers["mlp"] = {k: quant(w) for k, w in layers["mlp"].items()}
    for key in layers:
        if key not in new_layers and key not in ("q", "k", "v"):
            new_layers[key] = layers[key]
    out["layers"] = new_layers

    if "lm_head" in params:
        # the untied head is ~0.55 GB int8 at 7B — a full weight sweep per decode
        # step — but it is also the accuracy-critical matmul (logit argmax), so
        # int4 on it is OPT-IN (head_w4), matching GPTQ/AWQ practice of keeping
        # the head at higher precision. Embed always stays int8 (it's a gather).
        head = params["lm_head"]
        if head_w4 and supports_w4(head.shape[-2], group_size):
            out["lm_head"] = quantize_linear_w4(head, group_size)
        else:
            out["lm_head"] = quantize_linear(head)
    if quantize_embed:
        out["embed"] = quantize_embedding(params["embed"])
    return out


def q4_matmul_stacked(x: jnp.ndarray, p: dict, layer: jnp.ndarray) -> jnp.ndarray:
    """[..., K] @ layer `layer` of stacked w4 dict {'w_p': [L, K/2, N],
    'gscale': [L, K/G, N]} -> [..., N].

    Decode-shaped calls ride the scalar-prefetch Pallas kernel, which indexes the
    layer inside its BlockSpec maps — streaming straight from the stacked HBM
    array with no per-layer slice copy (lax.scan's slicing into a pallas operand
    otherwise materializes ~3.5 GB/step at 7B). Larger calls dynamic-slice and
    dequantize for XLA (prefill is FLOP-bound; the copy is noise there).
    """
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    k = x.shape[-1]
    n = p["w_p"].shape[-1]
    x2 = x.reshape(m, k)
    if m <= _PALLAS_MAX_ROWS and n % min(512, n) == 0:
        from audio_flamingo_tpu.ops.pallas.quant4_matmul import w4a16_matmul_stacked

        y = w4a16_matmul_stacked(x2, p["w_p"], p["gscale"], layer)
    else:
        sl = {"w_p": jax.lax.dynamic_index_in_dim(p["w_p"], layer, 0, keepdims=False),
              "gscale": jax.lax.dynamic_index_in_dim(p["gscale"], layer, 0,
                                                     keepdims=False)}
        w = dequantize_w4(sl, dtype=x.dtype)
        y = jax.lax.dot_general(x2, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        b = jax.lax.dynamic_index_in_dim(p["b"], layer, 0, keepdims=False)
        y = y + b.astype(y.dtype)
    return y.reshape(*lead, y.shape[-1])


def random_quantized_lm_w4(rng: jax.Array, cfg, group_size: int = DEFAULT_GROUP,
                           fuse: bool = True, head_w4: bool = False) -> dict:
    """Random w4-packed Qwen2 params WITHOUT materializing float weights first
    (7B f32 init would be ~30 GB; the packed tree is ~3.8 GB). Layout matches
    quantize_lm_params_w4(models/qwen2.init(...))."""
    import jax.random as jr

    hd = cfg.resolved_head_dim()
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def q4lin(key, a, b):
        assert supports_w4(a, group_size), (a, group_size)
        w_p = jr.randint(key, (L, a // 2, b), -128, 128, jnp.int8)
        gscale = jnp.full((L, a // group_size, b), 0.02 / 7.0, jnp.float32)
        return {"w_p": w_p, "gscale": gscale}

    keys = jr.split(rng, 12)
    n_q, n_kv = cfg.num_heads * hd, cfg.num_kv_heads * hd
    if fuse:
        layers = {
            "ln1_w": jnp.ones((L, d)),
            "qkv": {**q4lin(keys[0], d, n_q + 2 * n_kv)},
            "o": {**q4lin(keys[3], n_q, d)},
            "ln2_w": jnp.ones((L, d)),
            "mlp": {"gateup": q4lin(keys[4], d, 2 * f), "down": q4lin(keys[6], f, d)},
        }
        if cfg.attention_bias:
            layers["qkv"]["b"] = jnp.zeros((L, n_q + 2 * n_kv))
    else:
        layers = {
            "ln1_w": jnp.ones((L, d)),
            "q": {**q4lin(keys[0], d, n_q)},
            "k": {**q4lin(keys[1], d, n_kv)},
            "v": {**q4lin(keys[2], d, n_kv)},
            "o": {**q4lin(keys[3], n_q, d)},
            "ln2_w": jnp.ones((L, d)),
            "mlp": {"gate": q4lin(keys[4], d, f), "up": q4lin(keys[5], d, f),
                    "down": q4lin(keys[6], f, d)},
        }
        if cfg.attention_bias:
            layers["q"]["b"] = jnp.zeros((L, n_q))
            layers["k"]["b"] = jnp.zeros((L, n_kv))
            layers["v"]["b"] = jnp.zeros((L, n_kv))
    params = {
        "embed": {"w_q": jr.randint(keys[7], (cfg.vocab_size, d), -127, 128, jnp.int8),
                  "scale": jnp.full((cfg.vocab_size,), 0.02 / 127.0, jnp.float32)},
        "layers": layers,
        "ln_f_w": jnp.ones((d,)),
    }
    if not cfg.tie_word_embeddings:
        if head_w4:
            params["lm_head"] = {
                "w_p": jr.randint(keys[8], (d // 2, cfg.vocab_size), -128, 128,
                                  jnp.int8),
                "gscale": jnp.full((d // group_size, cfg.vocab_size), 0.02 / 7.0,
                                   jnp.float32)}
        else:
            params["lm_head"] = {
                "w_q": jr.randint(keys[8], (d, cfg.vocab_size), -127, 128, jnp.int8),
                "scale": jnp.full((cfg.vocab_size,), 0.02 / 127.0, jnp.float32)}
    return params
