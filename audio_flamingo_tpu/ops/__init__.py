from audio_flamingo_tpu.ops.norms import layer_norm, rms_norm
from audio_flamingo_tpu.ops.rope import apply_rope, rope_cos_sin
from audio_flamingo_tpu.ops.mlp import gelu_mlp, swiglu_mlp
from audio_flamingo_tpu.ops.attention import gqa_attention, gqa_attention_q8

__all__ = [
    "layer_norm",
    "rms_norm",
    "apply_rope",
    "rope_cos_sin",
    "gelu_mlp",
    "swiglu_mlp",
    "gqa_attention",
    "gqa_attention_q8",
]
