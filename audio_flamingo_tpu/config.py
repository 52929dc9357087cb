"""Typed model/runtime configs.

Config fields mirror the HF ``config.json`` vocabulary where a checkpoint format exists
(so imported checkpoints self-describe), cf. [hf] models/qwen2/configuration_qwen2.py:25
and [hf] models/qwen2_audio/configuration_qwen2_audio.py:86-98, but the classes are ours.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class MelConfig:
    """Log-mel frontend config (Whisper-style defaults).

    Numerical reference: [hf] models/whisper/feature_extraction_whisper.py:72-136.
    """

    sampling_rate: int = 16_000
    n_fft: int = 400          # 25 ms
    hop_length: int = 160     # 10 ms
    num_mel_bins: int = 128   # large-v3-class AF-Whisper; 80 for the classic family
    fmin: float = 0.0
    fmax: float = 8_000.0
    chunk_length_s: int = 30  # samples per window = 480_000 -> 3000 frames


@dataclass(frozen=True)
class ClapMelConfig:
    """CLAP/HTSAT frontend config. Reference: [hf] models/clap/feature_extraction_clap.py:86-137."""

    sampling_rate: int = 48_000
    n_fft: int = 1024
    hop_length: int = 480
    num_mel_bins: int = 64
    fmin: float = 0.0
    fmax: float = 14_000.0
    max_length_s: int = 10
    truncation: str = "fusion"   # "fusion" | "rand_trunc"
    padding: str = "repeatpad"   # "repeatpad" | "repeat" | "pad"


@dataclass(frozen=True)
class WhisperEncoderConfig:
    """AF-Whisper audio tower (Whisper-encoder architecture).

    Reference: [hf] models/whisper/modeling_whisper.py:588-730 and the audio-LLM defaults
    in [hf] models/qwen2_audio/configuration_qwen2_audio.py:86-98.
    """

    num_mel_bins: int = 128
    d_model: int = 1280
    num_layers: int = 32
    num_heads: int = 20
    ffn_dim: int = 5120
    max_source_positions: int = 1500  # tokens per 30 s window after the 2x conv stride
    activation: str = "gelu"
    layerscale: bool = False
    use_flash: bool = False   # Pallas flash attention (TPU); XLA attention otherwise
    # int8-QK flash attention (tolerance-band, ops/pallas/flash_attention_a8)
    a8_attention: bool = False
    # which layer stages use the fused quant-epilogue Pallas kernels when the
    # params carry the fused layout (ops/pallas/enc_fused.py); the others run
    # the XLA-composed w8a8 stages. Measured on-chip (round 4,
    # docs/TTFT_PERF.md): the fused MLP wins ~1.4 ms/layer in ISOLATION, but
    # every fused mix — including {"mlp"} — loses END-TO-END to XLA's
    # cross-stage fusion (479-495 vs 457 ms full encoder), so the default is
    # empty and the XLA w8a8 path ships. The kernels remain available for
    # shapes/backends where the tradeoff flips.
    fused_stages: tuple = ()
    # pooling after the stack: AF3's adaptor downsamples 2x like Qwen2-Audio's AvgPool1d(2,2)
    # ([hf] models/qwen2_audio/modeling_qwen2_audio.py:329,434-437)
    pool_stride: int = 2
    # Activation recompute for encoder-tuning stages ("none" | "dots" | "full")
    remat: str = "none"

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


@dataclass(frozen=True)
class Qwen2Config:
    """Qwen2/Qwen2.5 decoder config. Reference: [hf] models/qwen2/configuration_qwen2.py:25-."""

    vocab_size: int = 152_064
    hidden_size: int = 3584
    intermediate_size: int = 18_944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int | None = None     # default hidden_size // num_heads
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    max_position_embeddings: int = 32_768
    tie_word_embeddings: bool = False
    attention_bias: bool = True     # q/k/v bias=True, o_proj bias=False (Qwen2)
    sliding_window: int | None = None
    # HF gates the window PER LAYER: layer i slides iff sliding_window is set and
    # i >= max_window_layers ([hf] configuration_qwen2.py:204-207 layer_types; the
    # use_sliding_window master switch is applied at import time by nulling
    # sliding_window, mirroring [hf] configuration_qwen2.py:181).
    max_window_layers: int = 0
    use_flash: bool = False         # Pallas flash attention for prefill (q_len > 1)
    # w8a8 PREFILL matmuls on int8-quantized weights: dynamic per-token int8
    # activations hit the MXU's 2x int8 rate (ops/quant.q_matmul_a8). Multi-token
    # forwards only; decode stays w8a16. Accuracy is a tolerance band (~1e-2
    # logits), not bit-exact — a serving-latency knob, off by default.
    a8_prefill: bool = False
    # int8-QK flash attention for prefill (ops/pallas/flash_attention_a8): halves
    # the score-dot MXU time; tolerance-band accuracy like a8_prefill. Requires
    # use_flash; multi-token fresh-prefill forwards only. Off by default.
    a8_attention: bool = False
    # Activation recompute for training ("none" | "dots" | "full", ops/remat.py) —
    # the DeepSpeed-activation-checkpointing role (SURVEY.md §2.8); applies to the
    # cache-free forward and forward_sp (the backward-pass paths) only.
    remat: str = "none"

    def resolved_head_dim(self) -> int:
        return self.head_dim if self.head_dim is not None else self.hidden_size // self.num_heads

    @staticmethod
    def qwen25_7b() -> "Qwen2Config":
        return Qwen2Config()

    @staticmethod
    def qwen25_3b() -> "Qwen2Config":
        return Qwen2Config(vocab_size=151_936, hidden_size=2048, intermediate_size=11_008,
                           num_layers=36, num_heads=16, num_kv_heads=2, tie_word_embeddings=True)

    @staticmethod
    def qwen25_1_5b() -> "Qwen2Config":
        return Qwen2Config(vocab_size=151_936, hidden_size=1536, intermediate_size=8960,
                           num_layers=28, num_heads=12, num_kv_heads=2, tie_word_embeddings=True)

    @staticmethod
    def qwen25_0_5b() -> "Qwen2Config":
        return Qwen2Config(vocab_size=151_936, hidden_size=896, intermediate_size=4864,
                           num_layers=24, num_heads=14, num_kv_heads=2, tie_word_embeddings=True)


@dataclass(frozen=True)
class OPTConfig:
    """OPT decoder config (AF1's OPT-IML-MAX-1.3B).

    Reference: [hf] models/opt/configuration_opt.py:92-127 and modeling_opt.py:51-100
    (learned positions with offset 2, pre-norm, ReLU MLP, biased linears).
    """

    vocab_size: int = 50_272
    hidden_size: int = 2048
    ffn_dim: int = 8192
    num_layers: int = 24
    num_heads: int = 32
    max_position_embeddings: int = 2048
    position_offset: int = 2
    do_layer_norm_before: bool = True
    word_embed_proj_dim: int | None = None  # != hidden_size in some ckpts
    enable_bias: bool = True


@dataclass(frozen=True)
class ClapAudioConfig:
    """HTSAT (Swin-style) audio encoder config for CLAP / AF-CLAP.

    Reference: [hf] models/clap/modeling_clap.py (HTSAT audio branch) and
    configuration_clap.py audio defaults.
    """

    num_mel_bins: int = 64
    spec_size: int = 256              # mel spectrogram reshaped to spec_size x spec_size
    patch_size: int = 4
    patch_stride: int = 4
    patch_embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    projection_dim: int = 512
    hidden_act: str = "gelu"
    enable_fusion: bool = True
    layer_norm_eps: float = 1e-5


@dataclass(frozen=True)
class GatedXAttnConfig:
    """Flamingo-style gated cross-attention (AF1/AF2 fusion).

    Mechanism reference: [hf] models/idefics/modeling_idefics.py:691-815
    (tanh-gated residuals, zero-init alphas at :858-859).
    """

    cross_every_n_layers: int = 1
    num_heads: int = 32
    ffn_mult: int = 4


@dataclass(frozen=True)
class AF3Config:
    """AF3 / Music Flamingo: AF-Whisper -> MLP adaptor -> Qwen2.5 with prefix tokens."""

    encoder: WhisperEncoderConfig = field(default_factory=WhisperEncoderConfig)
    lm: Qwen2Config = field(default_factory=Qwen2Config)
    adaptor_hidden: int | None = None          # default: lm.hidden_size
    audio_token_id: int = 151_646              # <sound> placeholder id in the AF vocab
    max_windows: int = 20                      # 10 min = 20 x 30 s
    mel: MelConfig = field(default_factory=MelConfig)

    @staticmethod
    def music_flamingo() -> "AF3Config":
        """MF: AF3 backbone with extended context for full songs (README.md:42-48).

        30 windows = 15 min audio = 22.5k prefix tokens (within Qwen2.5's 32k RoPE
        positions; rope_theta 1e6 carries the extension, per the Qwen2.5 long-context
        recipe the AF3 lineage inherits)."""
        return AF3Config(max_windows=30)

    @staticmethod
    def tiny() -> "AF3Config":
        """Micro config for tests: 2-layer encoder, 2-layer LM."""
        return AF3Config(
            encoder=WhisperEncoderConfig(num_mel_bins=16, d_model=64, num_layers=2,
                                         num_heads=4, ffn_dim=128, max_source_positions=1500),
            lm=Qwen2Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                           num_layers=2, num_heads=4, num_kv_heads=2, tie_word_embeddings=True),
            audio_token_id=500,
        )


@dataclass(frozen=True)
class AF2Config:
    """AF1/AF2: CLAP tower -> audio-transform layers -> gated xattn into the LM."""

    clap: ClapAudioConfig = field(default_factory=ClapAudioConfig)
    lm: Qwen2Config = field(default_factory=Qwen2Config.qwen25_3b)
    xattn: GatedXAttnConfig = field(default_factory=GatedXAttnConfig)
    num_audio_transform_layers: int = 3
    audio_embed_dim: int = 512
    mel: ClapMelConfig = field(default_factory=ClapMelConfig)


def asdict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


@dataclass(frozen=True)
class AF1Config:
    """AF1: CLAP tower -> audio-transform layers -> gated xattn into OPT-IML-1.3B.

    Same composition as AF2 (models/flamingo.py dispatches on the LM config type);
    reference: SURVEY.md §2.0 row AF1.
    """

    @staticmethod
    def make(**kw) -> "AF2Config":
        defaults = dict(lm=OPTConfig(), xattn=GatedXAttnConfig(num_heads=32),
                        num_audio_transform_layers=3, audio_embed_dim=512)
        defaults.update(kw)
        return AF2Config(**defaults)
