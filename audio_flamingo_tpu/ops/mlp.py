"""Feed-forward blocks.

SwiGLU reference: [hf] models/qwen2/modeling_qwen2.py:34-48 (down(silu(gate(x)) * up(x)),
no biases). GELU MLP: Whisper encoder FFN ([hf] models/whisper/modeling_whisper.py:372-433);
OPT uses ReLU with biases ([hf] models/opt/modeling_opt.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swiglu_mlp(x: jnp.ndarray, params: dict) -> jnp.ndarray:
    """params: {'gate': [d, f], 'up': [d, f], 'down': [f, d]} — all bias-free."""
    gate = jnp.dot(x, params["gate"], preferred_element_type=jnp.float32).astype(x.dtype)
    up = jnp.dot(x, params["up"], preferred_element_type=jnp.float32).astype(x.dtype)
    h = jax.nn.silu(gate) * up
    return jnp.dot(h, params["down"], preferred_element_type=jnp.float32).astype(x.dtype)


def gelu_mlp(x: jnp.ndarray, params: dict, activation: str = "gelu") -> jnp.ndarray:
    """params: {'fc1': [d, f], 'fc1_b': [f], 'fc2': [f, d], 'fc2_b': [d]}.

    activation: 'gelu' (exact, matching torch nn.GELU default) or 'relu' (OPT).
    """
    h = jnp.dot(x, params["fc1"], preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + params["fc1_b"].astype(x.dtype)
    if activation == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    elif activation == "relu":
        h = jax.nn.relu(h)
    else:
        raise ValueError(f"unknown activation {activation!r}")
    out = jnp.dot(h, params["fc2"], preferred_element_type=jnp.float32).astype(x.dtype)
    return out + params["fc2_b"].astype(x.dtype)
