"""Weight-only int8 quantization (w8a16) for the decode path.

Decode is HBM-bandwidth-bound (weights stream once per token); int8 weights halve the
bytes -> ~2x decode tokens/s and fit the 7B LM in one v5e's HBM (SURVEY.md §6 north star:
7B decode throughput). Scales are per-output-channel; activations stay bf16; accumulation
fp32 on the MXU.

`quantize_linear` / `quantize_lm_params` produce pytrees the model linears consume
transparently (models/qwen2.py dispatches on the presence of "w_q").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_linear(w: jnp.ndarray) -> dict:
    """[in, out] float -> {'w_q': int8 [in, out], 'scale': f32 [out]}."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[None, :]), -127, 127)
    return {"w_q": w_q.astype(jnp.int8), "scale": scale}


def dequantize(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (p["w_q"].astype(jnp.float32) * p["scale"][None, :]).astype(dtype)


def q_matmul(x: jnp.ndarray, p: dict, use_pallas: bool = False) -> jnp.ndarray:
    """[..., in] @ int8 [in, out] * scale -> [..., out] in x.dtype.

    XLA path: int8 weights are converted inside the fused dot (no bf16 weight buffer is
    materialized in HBM for the steady state); Pallas path tiles explicitly.
    """
    if use_pallas and x.ndim == 2:
        from audio_flamingo_tpu.ops.pallas.quant_matmul import w8a16_matmul

        return w8a16_matmul(x, p["w_q"], p["scale"])
    y = jax.lax.dot_general(x, p["w_q"].astype(x.dtype),
                            (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def quantize_act(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token dynamic int8 activation quantization: x -> (x_q int8, x_scale f32).

    Split out of q_matmul_a8 so consumers sharing one activation (q/k/v share the
    ln1 output, gate/up the ln2 output) quantize it ONCE — the quant pass is pure
    VPU+HBM work (~0.7 ms per [15k, 3584] sweep on v5e) that the MXU never sees,
    so every duplicate is wall-clock added to a FLOP-bound prefill."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-6) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127
                   ).astype(jnp.int8)
    return x_q, x_scale


def q_matmul_a8q(x_q: jnp.ndarray, x_scale: jnp.ndarray, p: dict,
                 out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8-activation x int8-weight matmul on pre-quantized activations."""
    y = jax.lax.dot_general(x_q, p["w_q"],
                            (((x_q.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * x_scale * p["scale"].astype(jnp.float32)
    return y.astype(out_dtype)


def q_matmul_a8(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """w8a8: per-token dynamic int8 activation quantization x int8 weights.

    The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197 TOPS), so
    compute-bound PREFILL halves its matmul time; decode stays w8a16 (bandwidth-
    bound — activation quantization would add work without saving bytes that
    matter). Scales: per-token (row) for activations, per-output-channel for
    weights — the standard dynamic-quant recipe; accuracy is a tolerance band, not
    bit-exactness (tests/test_quant.py gates the divergence).
    """
    x_q, x_scale = quantize_act(x)
    return q_matmul_a8q(x_q, x_scale, p, out_dtype=x.dtype)


def random_quantized_lm(rng: jax.Array, cfg) -> dict:
    """Random int8-quantized Qwen2 params WITHOUT materializing f32 weights first.

    Needed to benchmark 7B-class models on one chip: f32 init would be ~30 GB. Layout
    matches quantize_lm_params(models/qwen2.init(...)).
    """
    import jax.random as jr

    hd = cfg.resolved_head_dim()
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def qlin(key, a, b):
        w = jr.randint(key, (L, a, b), -127, 128, jnp.int8)
        scale = jnp.full((L, b), 0.02 / 127.0, jnp.float32)
        return {"w_q": w, "scale": scale}

    keys = jr.split(rng, 12)
    layers = {
        "ln1_w": jnp.ones((L, d)),
        "q": {**qlin(keys[0], d, cfg.num_heads * hd)},
        "k": {**qlin(keys[1], d, cfg.num_kv_heads * hd)},
        "v": {**qlin(keys[2], d, cfg.num_kv_heads * hd)},
        "o": {**qlin(keys[3], cfg.num_heads * hd, d)},
        "ln2_w": jnp.ones((L, d)),
        "mlp": {"gate": qlin(keys[4], d, f), "up": qlin(keys[5], d, f),
                "down": qlin(keys[6], f, d)},
    }
    if cfg.attention_bias:
        layers["q"]["b"] = jnp.zeros((L, cfg.num_heads * hd))
        layers["k"]["b"] = jnp.zeros((L, cfg.num_kv_heads * hd))
        layers["v"]["b"] = jnp.zeros((L, cfg.num_kv_heads * hd))
    params = {
        "embed": {"w_q": jr.randint(keys[7], (cfg.vocab_size, d), -127, 128, jnp.int8),
                  "scale": jnp.full((cfg.vocab_size,), 0.02 / 127.0, jnp.float32)},
        "layers": layers,
        "ln_f_w": jnp.ones((d,)),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w_q": jr.randint(keys[8], (d, cfg.vocab_size), -127, 128,
                                               jnp.int8),
                             "scale": jnp.full((cfg.vocab_size,), 0.02 / 127.0,
                                               jnp.float32)}
    return params


def quantize_encoder_params(params: dict) -> dict:
    """Quantize a models/whisper_encoder.py param pytree's layer linears to int8.

    The encoder is COMPUTE-bound at TTFT shapes (20 windows x 1500 tokens,
    ~38 TFLOP of matmuls vs ~7 TFLOP of attention), so unlike the LM — where
    int8 weights serve decode bandwidth — the encoder's int8 exists for the
    MXU's 2x int8 rate: the model dispatches to w8a8 (q_matmul_a8) whenever
    'w_q' is present. Conv stems, positions, and norms stay float: the stems
    are <2% of encoder FLOPs and the conv int8 path buys nothing.
    """
    out = dict(params)

    def quant_layer_linear(w):  # stacked [L, in, out]
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)           # [L, out]
        scale = jnp.maximum(amax, 1e-8) / 127.0
        w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[:, None, :]), -127, 127)
        return {"w_q": w_q.astype(jnp.int8), "scale": scale}

    new_layers = {}
    for name in ("q", "k", "v", "o", "fc1", "fc2"):
        lin = dict(params["layers"][name])
        lin_q = quant_layer_linear(lin.pop("w"))
        lin.update(lin_q)
        new_layers[name] = lin
    for key in params["layers"]:
        if key not in new_layers:
            new_layers[key] = params["layers"][key]
    out["layers"] = new_layers
    return out


def quantize_encoder_params_fused(params: dict, head_dim: int) -> dict:
    """Fused-kernel encoder layout (ops/pallas/enc_fused.py).

    Same int8 per-output-channel quantization as quantize_encoder_params, but
    q|k|v are concatenated into one [L, d, 3d] matrix (one fused LN+quant+matmul
    kernel serves all three) and the reference's q pre-scale (head_dim**-0.5,
    [hf] modeling_whisper.py q_proj * scaling) is folded into the q columns'
    scales and bias: (x@Wq + bq)*s == x@Wq with scale*s and bias bq*s.
    models/whisper_encoder dispatches on the 'qkv' key.
    """
    layers = params["layers"]
    d = layers["q"]["w"].shape[1]
    qs = jnp.float32(head_dim) ** -0.5

    def quant(w):  # stacked [L, in, out]
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)           # [L, out]
        scale = jnp.maximum(amax, 1e-8) / 127.0
        w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[:, None, :]), -127, 127)
        return w_q.astype(jnp.int8), scale

    qw, qsc = quant(layers["q"]["w"])
    kw, ksc = quant(layers["k"]["w"])
    vw, vsc = quant(layers["v"]["w"])
    ow, osc = quant(layers["o"]["w"])
    f1w, f1sc = quant(layers["fc1"]["w"])
    f2w, f2sc = quant(layers["fc2"]["w"])
    zeros_d = jnp.zeros_like(layers["q"]["b"])
    new_layers = {
        "ln1_w": layers["ln1_w"], "ln1_b": layers["ln1_b"],
        "ln2_w": layers["ln2_w"], "ln2_b": layers["ln2_b"],
        "qkv": {
            "w_q": jnp.concatenate([qw, kw, vw], axis=2),
            "scale": jnp.concatenate([qsc * qs, ksc, vsc], axis=1),
            "b": jnp.concatenate([layers["q"]["b"].astype(jnp.float32) * qs,
                                  layers["k"].get("b", zeros_d),
                                  layers["v"]["b"]], axis=1),
        },
        "o": {"w_q": ow, "scale": osc, "b": layers["o"]["b"]},
        "fc1": {"w_q": f1w, "scale": f1sc, "b": layers["fc1"]["b"]},
        "fc2": {"w_q": f2w, "scale": f2sc, "b": layers["fc2"]["b"]},
    }
    out = dict(params)
    out["layers"] = new_layers
    return out


def quantize_lm_params(params: dict, quantize_embed: bool = True) -> dict:
    """Quantize a models/qwen2.py param pytree's big linears (layers + lm_head [+embed]).

    Norm weights and biases stay f32. The embedding matrix is stored int8 with per-ROW
    (vocab) scales so gathers dequantize per token.
    """
    out = dict(params)
    layers = params["layers"]

    def quant_layer_linear(w):  # [L, in, out]
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)           # [L, out]
        scale = jnp.maximum(amax, 1e-8) / 127.0
        w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[:, None, :]), -127, 127)
        return {"w_q": w_q.astype(jnp.int8), "scale": scale}

    new_layers = {}
    for name in ("q", "k", "v", "o"):
        lin = dict(layers[name])
        lin_q = quant_layer_linear(layers[name]["w"])
        lin.pop("w")
        lin.update(lin_q)
        new_layers[name] = lin
    new_layers["mlp"] = {k: quant_layer_linear(w) for k, w in layers["mlp"].items()}
    for key in layers:
        if key not in new_layers:
            new_layers[key] = layers[key]
    out["layers"] = new_layers

    if "lm_head" in params:
        out["lm_head"] = quantize_linear(params["lm_head"])
    if quantize_embed:
        out["embed"] = quantize_embedding(params["embed"])
    return out


def quantize_embedding(emb: jnp.ndarray) -> dict:
    """[V, D] float -> int8 with per-ROW (vocab) scales so gathers dequantize
    per token. Shared by the int8 and int4 LM quantizers."""
    emb = emb.astype(jnp.float32)
    amax = jnp.max(jnp.abs(emb), axis=1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    return {"w_q": jnp.clip(jnp.round(emb / scale[:, None]), -127, 127)
            .astype(jnp.int8), "scale": scale}
