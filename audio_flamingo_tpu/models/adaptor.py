"""Audio adaptor: projects encoder features into the LM embedding space.

AF3/MF use an MLP audio adaptor (static/af3_main_diagram-1.png "Audio Adaptor" box;
2-layer MLP per SURVEY.md §2.4 ⚠recon); Qwen2-Audio's wiring-identical projector is a
single Linear ([hf] models/qwen2_audio/modeling_qwen2_audio.py:459-466). Both supported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init(rng: jax.Array, d_in: int, d_out: int, num_layers: int = 2) -> dict:
    keys = jax.random.split(rng, num_layers)
    scale1 = d_in ** -0.5
    p = {"fc1": {"w": jax.random.normal(keys[0], (d_in, d_out), jnp.float32) * scale1 * 0.5,
                 "b": jnp.zeros((d_out,), jnp.float32)}}
    if num_layers == 2:
        scale2 = d_out ** -0.5
        p["fc2"] = {"w": jax.random.normal(keys[1], (d_out, d_out), jnp.float32) * scale2 * 0.5,
                    "b": jnp.zeros((d_out,), jnp.float32)}
    return p


def apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, params["fc1"]["w"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    y = y + params["fc1"]["b"].astype(x.dtype)
    if "fc2" in params:
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.dot(y, params["fc2"]["w"].astype(y.dtype),
                    preferred_element_type=jnp.float32).astype(y.dtype)
        y = y + params["fc2"]["b"].astype(y.dtype)
    return y
