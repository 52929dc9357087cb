"""AF-Whisper audio tower: Whisper-encoder architecture, TPU-first.

Architecture reference (golden-tested): [hf] models/whisper/modeling_whisper.py:588-730
(conv stem :608-609, frozen sinusoidal positions :54-64,611-612, pre-norm layers
:372-433 with k_proj bias=False :283, final LayerNorm :615).

Design deltas vs the torch reference (intentional, TPU-first):
- pure pytree params; the 32 layers are scan-stacked (leading layer axis) and executed
  with `jax.lax.scan` for O(1) trace/compile size;
- attention runs through ops.gqa_attention (nkv == nh), fp32 softmax;
- each 30 s window (3000 mel frames -> 1500 tokens) is an independent batch row, so long
  audio parallelizes across batch and mesh ("encoder-window parallel", SURVEY.md §2.9).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import WhisperEncoderConfig
from audio_flamingo_tpu.ops import gelu_mlp, gqa_attention, layer_norm


def sinusoid_positions(length: int, channels: int, max_timescale: float = 10_000.0) -> np.ndarray:
    """Whisper sinusoid table: concat([sin, cos], axis=1). [hf] modeling_whisper.py:54-64."""
    inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2, dtype=np.float64))
    t = np.arange(length, dtype=np.float64)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _linear_init(rng, d_in, d_out, bias=True):
    k1, _ = jax.random.split(rng)
    scale = (1.0 / d_in) ** 0.5
    p = {"w": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _layer_init(rng, cfg: WhisperEncoderConfig):
    d, f = cfg.d_model, cfg.ffn_dim
    keys = jax.random.split(rng, 6)
    return {
        "ln1_w": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "q": _linear_init(keys[0], d, d),
        "k": _linear_init(keys[1], d, d, bias=False),
        "v": _linear_init(keys[2], d, d),
        "o": _linear_init(keys[3], d, d),
        "ln2_w": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
        "fc1": _linear_init(keys[4], d, f),
        "fc2": _linear_init(keys[5], f, d),
    }


def init(rng: jax.Array, cfg: WhisperEncoderConfig) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 2)
    layers = [_layer_init(k, cfg) for k in keys[: cfg.num_layers]]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    d = cfg.d_model
    conv_scale1 = (1.0 / (cfg.num_mel_bins * 3)) ** 0.5
    conv_scale2 = (1.0 / (d * 3)) ** 0.5
    return {
        # conv weights stored [k, in, out] (XLA 'WIO')
        "conv1_w": jax.random.uniform(keys[-2], (3, cfg.num_mel_bins, d), jnp.float32,
                                      -conv_scale1, conv_scale1),
        "conv1_b": jnp.zeros((d,)),
        "conv2_w": jax.random.uniform(keys[-1], (3, d, d), jnp.float32,
                                      -conv_scale2, conv_scale2),
        "conv2_b": jnp.zeros((d,)),
        "pos": jnp.asarray(sinusoid_positions(cfg.max_source_positions, d)),
        "layers": stacked,
        "ln_post_w": jnp.ones((d,)), "ln_post_b": jnp.zeros((d,)),
    }


def _linear(x, p):
    if "w_q" in p:  # int8 weights -> w8a8 path (ops/quant.quantize_encoder_params)
        from audio_flamingo_tpu.ops.quant import q_matmul_a8

        y = q_matmul_a8(x, p)
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _largest_divisor_tile(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap (enc_mlp requires ffn_dim % f_tile
    == 0; a bare min() trips the assert for ffn_dims like whisper-small's 3072
    that exceed but don't divide by the cap — ADVICE r4 #2)."""
    for t in range(min(n, cap), 0, -1):
        if n % t == 0:
            return t
    return 1


def _layer_forward_fused(x: jnp.ndarray, lp: dict, cfg: WhisperEncoderConfig) -> jnp.ndarray:
    """Fused quant-epilogue w8a8 layer (ops/pallas/enc_fused.py): three Pallas
    calls keep every LN / activation-quant / GELU / dequant pass in VMEM — the
    XLA-composed a8 path ran at ~21% of int8 peak because that glue round-trips
    HBM (docs/TTFT_PERF.md). Layout from ops/quant.quantize_encoder_params_fused."""
    from audio_flamingo_tpu.ops.pallas.enc_fused import enc_ln_qkv, enc_mlp, enc_out_ln

    assert cfg.activation == "gelu", "fused a8 path bakes exact GELU in-kernel"
    from audio_flamingo_tpu.ops.quant import q_matmul_a8q, quantize_act

    b, s, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    xf = x.reshape(b * s, d)
    if "qkv" in cfg.fused_stages:
        qkv = enc_ln_qkv(xf, lp["ln1_w"], lp["ln1_b"], lp["qkv"]["w_q"],
                         lp["qkv"]["scale"], lp["qkv"]["b"])
    else:
        h = layer_norm(xf, lp["ln1_w"], lp["ln1_b"])
        hq3 = quantize_act(h)
        qkv = q_matmul_a8q(*hq3, lp["qkv"], out_dtype=h.dtype) \
            + lp["qkv"]["b"].astype(h.dtype)
    q, k, v = (a.reshape(b, s, nh, hd) for a in jnp.split(qkv, 3, axis=-1))
    if cfg.use_flash:
        from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention

        attn = flash_attention(q, k, v, scale=1.0, block_q=512, block_k=2048)
    else:
        attn = gqa_attention(q, k, v, scale=1.0)
    if "out" in cfg.fused_stages:
        x2, hq, hs = enc_out_ln(attn.reshape(b * s, d), xf, lp["o"]["w_q"],
                                lp["o"]["scale"], lp["o"]["b"],
                                lp["ln2_w"], lp["ln2_b"])
    else:
        ao = attn.reshape(b * s, d)
        x2 = xf + q_matmul_a8q(*quantize_act(ao), lp["o"], out_dtype=ao.dtype) \
            + lp["o"]["b"].astype(ao.dtype)
        hq, hs = quantize_act(layer_norm(x2, lp["ln2_w"], lp["ln2_b"]))
        hs = hs.astype(jnp.float32)
    if "mlp" in cfg.fused_stages:
        from audio_flamingo_tpu.ops.pallas import enc_fused as ef

        x3 = enc_mlp(hq, hs, lp["fc1"]["w_q"], lp["fc1"]["scale"],
                     lp["fc1"]["b"], lp["fc2"]["w_q"], lp["fc2"]["scale"],
                     lp["fc2"]["b"], x2, block_m=ef.ENC_MLP_BLOCK_M,
                     f_tile=_largest_divisor_tile(cfg.ffn_dim,
                                                  ef.ENC_MLP_F_TILE))
    else:
        g = q_matmul_a8q(hq, hs, lp["fc1"], out_dtype=x2.dtype) \
            + lp["fc1"]["b"].astype(x2.dtype)
        g = jax.nn.gelu(g.astype(jnp.float32), approximate=False)
        gq, gs = quantize_act(g.astype(x2.dtype))
        x3 = x2 + q_matmul_a8q(gq, gs, lp["fc2"], out_dtype=x2.dtype) \
            + lp["fc2"]["b"].astype(x2.dtype)
    return x3.reshape(b, s, d)


def _layer_forward(x: jnp.ndarray, lp: dict, cfg: WhisperEncoderConfig) -> jnp.ndarray:
    if "qkv" in lp:
        return _layer_forward_fused(x, lp, cfg)
    b, s, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    h = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
    # q pre-scaled like the reference ([hf] modeling_whisper.py q_proj * scaling)
    if "w_q" in lp["q"]:
        from audio_flamingo_tpu.ops.quant import q_matmul_a8q, quantize_act

        hq = quantize_act(h)  # one activation quant sweep shared by q/k/v
        q = ((q_matmul_a8q(*hq, lp["q"], out_dtype=h.dtype)
              + lp["q"]["b"].astype(h.dtype)) * (hd ** -0.5)).reshape(b, s, nh, hd)
        k = q_matmul_a8q(*hq, lp["k"], out_dtype=h.dtype).reshape(b, s, nh, hd)
        v = (q_matmul_a8q(*hq, lp["v"], out_dtype=h.dtype)
             + lp["v"]["b"].astype(h.dtype)).reshape(b, s, nh, hd)
    else:
        q = (_linear(h, lp["q"]) * (hd ** -0.5)).reshape(b, s, nh, hd)
        k = _linear(h, lp["k"]).reshape(b, s, nh, hd)
        v = _linear(h, lp["v"]).reshape(b, s, nh, hd)
    if cfg.use_flash and getattr(cfg, "a8_attention", False):
        from audio_flamingo_tpu.ops.pallas.flash_attention_a8 import flash_attention_a8

        attn = flash_attention_a8(q, k, v, scale=1.0, block_q=512,
                                  block_k=2048).reshape(b, s, d)
    elif cfg.use_flash:
        from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention

        # block_q=512, block_k=2048: one KV block per program (T=1500 pads to 1536)
        # with 512-row q tiles — fastest measured config on v5e; see
        # docs/ENCODER_PERF.md for the block sweep and MXU-utilization roofline
        attn = flash_attention(q, k, v, scale=1.0, block_q=512,
                               block_k=2048).reshape(b, s, d)
    else:
        attn = gqa_attention(q, k, v, scale=1.0).reshape(b, s, d)
    x = x + _linear(attn, lp["o"])
    h = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
    if "w_q" in lp["fc1"]:
        act = _linear(h, lp["fc1"])
        act = jax.nn.gelu(act, approximate=False) if cfg.activation == "gelu" \
            else jax.nn.relu(act)
        ffn = _linear(act, lp["fc2"])
    else:
        ffn = gelu_mlp(h, {"fc1": lp["fc1"]["w"].astype(x.dtype), "fc1_b": lp["fc1"]["b"],
                           "fc2": lp["fc2"]["w"].astype(x.dtype), "fc2_b": lp["fc2"]["b"]},
                       activation=cfg.activation)
    return x + ffn


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def apply(params: dict, cfg: WhisperEncoderConfig, mels: jnp.ndarray,
          compute_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """[num_windows, 2*max_source_positions frames, num_mel_bins] -> [num_windows, T, d_model].

    Strict input length like the reference ([hf] modeling_whisper.py:668-672): exactly
    3000 mel frames per window. Output T = max_source_positions (1500).
    """
    n, frames, n_mels = mels.shape
    assert frames == 2 * cfg.max_source_positions, (frames, cfg.max_source_positions)
    assert n_mels == cfg.num_mel_bins

    x = mels.astype(compute_dtype)
    dn = jax.lax.conv_dimension_numbers((n, frames, n_mels), (3, n_mels, cfg.d_model),
                                        ("NWC", "WIO", "NWC"))
    x = jax.lax.conv_general_dilated(x, params["conv1_w"].astype(compute_dtype),
                                     window_strides=(1,), padding=((1, 1),),
                                     dimension_numbers=dn)
    x = jax.nn.gelu(x + params["conv1_b"].astype(compute_dtype), approximate=False)
    dn2 = jax.lax.conv_dimension_numbers(x.shape, (3, cfg.d_model, cfg.d_model),
                                         ("NWC", "WIO", "NWC"))
    x = jax.lax.conv_general_dilated(x, params["conv2_w"].astype(compute_dtype),
                                     window_strides=(2,), padding=((1, 1),),
                                     dimension_numbers=dn2)
    x = jax.nn.gelu(x + params["conv2_b"].astype(compute_dtype), approximate=False)

    x = x + params["pos"].astype(compute_dtype)[None]

    def body(h, lp):
        return _layer_forward(h, lp, cfg), None

    from audio_flamingo_tpu.ops.remat import remat_wrap

    x, _ = jax.lax.scan(remat_wrap(body, cfg.remat), x, params["layers"])
    # pooling runs BEFORE the final LayerNorm, matching
    # [hf] models/qwen2_audio/modeling_qwen2_audio.py:434-439 (avg_pooler then layer_norm)
    x = pool_output(x, cfg.pool_stride)
    return layer_norm(x, params["ln_post_w"], params["ln_post_b"])


def pool_output(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """AvgPool1d(stride, stride) over time, matching
    [hf] models/qwen2_audio/modeling_qwen2_audio.py:329,434-437."""
    if stride == 1:
        return x
    n, t, d = x.shape
    return x.reshape(n, t // stride, stride, d).mean(axis=2)
