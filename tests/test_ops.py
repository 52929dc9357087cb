"""Golden tests: core ops vs the local PyTorch reference modules.

References: [hf] models/qwen2/modeling_qwen2.py (RMSNorm :187, RoPE :50-83, MLP :34-48,
attention :122-186).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.ops import (
    apply_rope,
    gelu_mlp,
    gqa_attention,
    layer_norm,
    rms_norm,
    rope_cos_sin,
    swiglu_mlp,
)
from audio_flamingo_tpu.ops.attention import causal_mask

jax.config.update("jax_default_matmul_precision", "highest")


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_rms_norm_matches_qwen2():
    from transformers.models.qwen2.modeling_qwen2 import Qwen2RMSNorm

    torch.manual_seed(0)
    mod = Qwen2RMSNorm(64, eps=1e-6)
    with torch.no_grad():
        mod.weight.copy_(torch.randn(64))
    x = torch.randn(2, 5, 64)
    ref = mod(x).detach().numpy()
    ours = np.asarray(rms_norm(t2j(x), t2j(mod.weight), eps=1e-6))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_layer_norm_matches_torch():
    torch.manual_seed(1)
    mod = torch.nn.LayerNorm(48)
    with torch.no_grad():
        mod.weight.copy_(torch.randn(48))
        mod.bias.copy_(torch.randn(48))
    x = torch.randn(3, 7, 48)
    ref = mod(x).detach().numpy()
    ours = np.asarray(layer_norm(t2j(x), t2j(mod.weight), t2j(mod.bias), eps=1e-5))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rope_matches_qwen2():
    from transformers.models.qwen2.modeling_qwen2 import (
        Qwen2RotaryEmbedding,
        apply_rotary_pos_emb,
    )
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config as HFQwen2Config

    cfg = HFQwen2Config(hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
                        rope_theta=1e6)
    rot = Qwen2RotaryEmbedding(config=cfg)
    b, s, nh, nkv, hd = 2, 9, 4, 2, 16
    torch.manual_seed(2)
    q = torch.randn(b, nh, s, hd)
    k = torch.randn(b, nkv, s, hd)
    pos = torch.arange(s)[None].expand(b, s)
    cos, sin = rot(q, pos)
    q_ref, k_ref = apply_rotary_pos_emb(q, k, cos, sin)

    cos_j, sin_j = rope_cos_sin(jnp.asarray(pos.numpy()), hd, theta=1e6)
    np.testing.assert_allclose(np.asarray(cos_j), cos.numpy(), atol=1e-5)
    q_j, k_j = apply_rope(
        t2j(q.permute(0, 2, 1, 3)), t2j(k.permute(0, 2, 1, 3)), cos_j, sin_j
    )
    np.testing.assert_allclose(np.asarray(q_j), q_ref.permute(0, 2, 1, 3).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_j), k_ref.permute(0, 2, 1, 3).numpy(), atol=1e-5)


def test_gqa_attention_matches_torch_sdpa():
    torch.manual_seed(3)
    b, q_len, kv_len, nh, nkv, hd = 2, 6, 6, 8, 2, 16
    q = torch.randn(b, nh, q_len, hd)
    k = torch.randn(b, nkv, kv_len, hd)
    v = torch.randn(b, nkv, kv_len, hd)
    ref = torch.nn.functional.scaled_dot_product_attention(
        q, k, v, is_causal=True, enable_gqa=True
    )  # [b, nh, q, hd]
    ours = gqa_attention(
        t2j(q.permute(0, 2, 1, 3)), t2j(k.permute(0, 2, 1, 3)), t2j(v.permute(0, 2, 1, 3)),
        mask=causal_mask(q_len, kv_len),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 1, 3).numpy(), atol=1e-5)


def test_gqa_attention_padding_mask():
    """Padded kv positions must get exactly zero probability."""
    b, q_len, kv_len, nh, nkv, hd = 1, 4, 8, 4, 2, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, q_len, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, kv_len, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, kv_len, nkv, hd)), jnp.float32)
    valid = jnp.arange(kv_len)[None, None, None, :] < 5
    out_masked = gqa_attention(q, k, v, mask=jnp.broadcast_to(valid, (b, 1, q_len, kv_len)))
    out_trunc = gqa_attention(q, k[:, :5], v[:, :5], mask=None)
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc), atol=1e-6)


def test_swiglu_matches_qwen2_mlp():
    from transformers.models.qwen2.modeling_qwen2 import Qwen2MLP
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config as HFQwen2Config

    cfg = HFQwen2Config(hidden_size=32, intermediate_size=64)
    torch.manual_seed(4)
    mod = Qwen2MLP(cfg)
    x = torch.randn(2, 5, 32)
    ref = mod(x).detach().numpy()
    params = {
        "gate": t2j(mod.gate_proj.weight.T),
        "up": t2j(mod.up_proj.weight.T),
        "down": t2j(mod.down_proj.weight.T),
    }
    ours = np.asarray(swiglu_mlp(t2j(x), params))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gelu_mlp_matches_whisper_ffn():
    from transformers.models.whisper.modeling_whisper import WhisperEncoderLayer
    from transformers.models.whisper.configuration_whisper import WhisperConfig

    cfg = WhisperConfig(d_model=32, encoder_attention_heads=4, encoder_ffn_dim=64)
    torch.manual_seed(5)
    layer = WhisperEncoderLayer(cfg)
    x = torch.randn(2, 6, 32)
    with torch.no_grad():
        h = layer.final_layer_norm(x)
        ref = layer.fc2(layer.activation_fn(layer.fc1(h))).numpy()
    params = {
        "fc1": t2j(layer.fc1.weight.T), "fc1_b": t2j(layer.fc1.bias),
        "fc2": t2j(layer.fc2.weight.T), "fc2_b": t2j(layer.fc2.bias),
    }
    h_j = layer_norm(t2j(x), t2j(layer.final_layer_norm.weight), t2j(layer.final_layer_norm.bias))
    ours = np.asarray(gelu_mlp(h_j, params))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
