"""Streaming TTS head (AF3-Chat voice output).

Capability reference: README.md:109 ("streaming TTS module (AF3-Chat) to output voice")
and static/af3_main_diagram-1.png (LLM text tokens -> "Streaming TTS" -> waveform); the
branch implementation is unmounted (⚠recon, SURVEY.md §2.7), so this is a TPU-native
design with the same interface: consume the LM token stream chunk-by-chunk, emit waveform
incrementally.

Architecture: per chunk of `chunk_tokens` text tokens, a small transformer maps token
embeddings + learned mel-frame queries (+ a continuity state carried between chunks) to
`frames_per_chunk` log-mel frames; audio/vocoder.py turns mel chunks into waveform. All
shapes static -> one compiled step per chunk, streaming-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.ops import gelu_mlp, gqa_attention, layer_norm


@dataclass(frozen=True)
class TTSConfig:
    vocab_size: int = 152_064
    d_model: int = 256
    num_layers: int = 4
    num_heads: int = 4
    ffn_dim: int = 1024
    n_mels: int = 80
    chunk_tokens: int = 16          # text tokens consumed per step
    frames_per_chunk: int = 64      # mel frames emitted per step (~0.64 s at 10 ms hop)
    state_frames: int = 8           # trailing frames fed back for continuity
    num_speakers: int = 0           # >0: learned speaker-embedding conditioning token
    rvq_quantizers: int = 0         # >0: ALSO emit RVQ code logits (audio/rvq.py codec)
    rvq_codebook: int = 256


def _lin(rng, a, b_, bias=True):
    p = {"w": jax.random.normal(rng, (a, b_), jnp.float32) * (a ** -0.5) * 0.5}
    if bias:
        p["b"] = jnp.zeros((b_,), jnp.float32)
    return p


def _block_init(rng, cfg: TTSConfig):
    k = jax.random.split(rng, 6)
    d = cfg.d_model
    return {
        "ln1_w": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "q": _lin(k[0], d, d), "k": _lin(k[1], d, d), "v": _lin(k[2], d, d),
        "o": _lin(k[3], d, d),
        "ln2_w": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
        "fc1": _lin(k[4], d, cfg.ffn_dim), "fc2": _lin(k[5], cfg.ffn_dim, d),
    }


def init(rng: jax.Array, cfg: TTSConfig) -> dict:
    keys = jax.random.split(rng, cfg.num_layers + 6)
    blocks = [_block_init(keys[i], cfg) for i in range(cfg.num_layers)]
    params = {
        "embed": jax.random.normal(keys[-1], (cfg.vocab_size, cfg.d_model)) * 0.02,
        "queries": jax.random.normal(keys[-2], (cfg.frames_per_chunk, cfg.d_model)) * 0.02,
        "state_proj": _lin(keys[-3], cfg.n_mels, cfg.d_model),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_f_w": jnp.ones((cfg.d_model,)), "ln_f_b": jnp.zeros((cfg.d_model,)),
        "mel_out": _lin(keys[-4], cfg.d_model, cfg.n_mels),
    }
    if cfg.num_speakers > 0:
        params["speaker"] = jax.random.normal(
            keys[-5], (cfg.num_speakers, cfg.d_model)) * 0.02
    if cfg.rvq_quantizers > 0:
        params["rvq_out"] = _lin(keys[-6], cfg.d_model,
                                 cfg.rvq_quantizers * cfg.rvq_codebook)
    return params


def _block(x, bp, nh):
    b, t, d = x.shape
    hd = d // nh

    def lin(h, p):
        y = jnp.dot(h, p["w"].astype(h.dtype))
        return y + p["b"].astype(h.dtype) if "b" in p else y

    h = layer_norm(x, bp["ln1_w"], bp["ln1_b"])
    q = lin(h, bp["q"]).reshape(b, t, nh, hd)
    k = lin(h, bp["k"]).reshape(b, t, nh, hd)
    v = lin(h, bp["v"]).reshape(b, t, nh, hd)
    x = x + lin(gqa_attention(q, k, v).reshape(b, t, d), bp["o"])
    h = layer_norm(x, bp["ln2_w"], bp["ln2_b"])
    return x + gelu_mlp(h, {"fc1": bp["fc1"]["w"], "fc1_b": bp["fc1"]["b"],
                            "fc2": bp["fc2"]["w"], "fc2_b": bp["fc2"]["b"]})


def _trunk(params: dict, cfg: TTSConfig, token_ids: jnp.ndarray,
           prev_mel: jnp.ndarray, speaker: jnp.ndarray | None) -> jnp.ndarray:
    """Shared transformer trunk -> per-frame query hidden states [B, frames, D].

    Sequence = [speaker?, text tokens, continuity state frames, frame queries];
    the speaker conditioning token (cfg.num_speakers > 0) is attended by every
    query, so voice identity modulates the whole chunk."""
    b = token_ids.shape[0]
    tok = params["embed"][token_ids]                                  # [B, C, D]
    state = jnp.dot(prev_mel, params["state_proj"]["w"]) + params["state_proj"]["b"]
    queries = jnp.broadcast_to(params["queries"][None], (b, cfg.frames_per_chunk,
                                                         cfg.d_model))
    parts = [tok, state, queries]
    if speaker is not None:
        assert cfg.num_speakers > 0, "cfg.num_speakers must be set for speaker ids"
        parts.insert(0, params["speaker"][speaker][:, None])          # [B, 1, D]
    x = jnp.concatenate(parts, axis=1)

    def body(h, bp):
        return _block(h, bp, cfg.num_heads), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["ln_f_w"], params["ln_f_b"])
    return x[:, -cfg.frames_per_chunk:]


@partial(jax.jit, static_argnames=("cfg",))
def synthesize_chunk(params: dict, cfg: TTSConfig, token_ids: jnp.ndarray,
                     prev_mel: jnp.ndarray,
                     speaker: jnp.ndarray | None = None) -> jnp.ndarray:
    """[B, chunk_tokens] token ids + [B, state_frames, n_mels] continuity state
    (+ optional [B] speaker ids) -> [B, frames_per_chunk, n_mels] log-mel frames."""
    out = _trunk(params, cfg, token_ids, prev_mel, speaker)
    return jnp.dot(out, params["mel_out"]["w"]) + params["mel_out"]["b"]


@partial(jax.jit, static_argnames=("cfg",))
def rvq_chunk_logits(params: dict, cfg: TTSConfig, token_ids: jnp.ndarray,
                     prev_mel: jnp.ndarray,
                     speaker: jnp.ndarray | None = None) -> jnp.ndarray:
    """RVQ-token decoder head: -> [B, frames_per_chunk, quantizers, codebook] logits
    over audio/rvq.py codes (discrete mel-codec targets)."""
    assert cfg.rvq_quantizers > 0
    out = _trunk(params, cfg, token_ids, prev_mel, speaker)
    logits = jnp.dot(out, params["rvq_out"]["w"]) + params["rvq_out"]["b"]
    b = token_ids.shape[0]
    return logits.reshape(b, cfg.frames_per_chunk, cfg.rvq_quantizers,
                          cfg.rvq_codebook)


def rvq_loss(params: dict, cfg: TTSConfig, rvq_params: dict, rvq_cfg,
             token_ids: jnp.ndarray, prev_mel: jnp.ndarray,
             target_mel: jnp.ndarray, speaker: jnp.ndarray | None = None) -> jnp.ndarray:
    """Cross-entropy on teacher codes: the codec (audio/rvq.py) encodes the target
    mel into discrete codes, the head is trained to predict them."""
    from audio_flamingo_tpu.audio import rvq as rvq_mod

    codes = rvq_mod.encode(rvq_params, rvq_cfg, target_mel)   # [B, F, Q]
    logits = rvq_chunk_logits(params, cfg, token_ids, prev_mel, speaker)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def synthesize_rvq(params: dict, cfg: TTSConfig, rvq_params: dict, rvq_cfg,
                   token_ids, pad_id: int = 0, speaker=None):
    """Whole-utterance RVQ-mode synthesis: argmax codes -> codec decode -> mel.
    Returns [frames, n_mels] (feed to a vocoder)."""
    import numpy as np

    from audio_flamingo_tpu.audio import rvq as rvq_mod

    ids = list(token_ids)
    n_chunks = max(1, -(-len(ids) // cfg.chunk_tokens))
    ids = ids + [pad_id] * (n_chunks * cfg.chunk_tokens - len(ids))
    state = jnp.zeros((1, cfg.state_frames, cfg.n_mels), jnp.float32)
    mels = []
    for c in range(n_chunks):
        chunk = jnp.asarray([ids[c * cfg.chunk_tokens: (c + 1) * cfg.chunk_tokens]])
        logits = rvq_chunk_logits(params, cfg, chunk, state, speaker)
        codes = jnp.argmax(logits, axis=-1)
        mel = rvq_mod.decode(rvq_params, rvq_cfg, codes)
        state = mel[:, -cfg.state_frames:]
        mels.append(np.asarray(mel[0]))
    return np.concatenate(mels, axis=0)


def synthesize(params: dict, cfg: TTSConfig, token_ids, pad_id: int = 0, speaker=None):
    """Whole-utterance synthesis: chunk the token stream and emit mel chunk-by-chunk.

    token_ids: [T] python list / 1-D array. Returns [frames, n_mels].
    """
    import numpy as np

    ids = list(token_ids)
    n_chunks = max(1, -(-len(ids) // cfg.chunk_tokens))
    ids = ids + [pad_id] * (n_chunks * cfg.chunk_tokens - len(ids))
    state = jnp.zeros((1, cfg.state_frames, cfg.n_mels), jnp.float32)
    mels = []
    for c in range(n_chunks):
        chunk = jnp.asarray([ids[c * cfg.chunk_tokens: (c + 1) * cfg.chunk_tokens]])
        mel = synthesize_chunk(params, cfg, chunk, state, speaker)
        state = mel[:, -cfg.state_frames:]
        mels.append(np.asarray(mel[0]))
    return np.concatenate(mels, axis=0)


def loss(params: dict, cfg: TTSConfig, token_ids: jnp.ndarray, prev_mel: jnp.ndarray,
         target_mel: jnp.ndarray, mask: jnp.ndarray | None = None,
         speaker: jnp.ndarray | None = None) -> jnp.ndarray:
    """Voice-to-voice training loss (AF3 stage 4): L1+L2 on predicted log-mel frames.

    token_ids [B, chunk_tokens]; prev_mel [B, state_frames, n_mels];
    target_mel [B, frames_per_chunk, n_mels]; mask [B, frames_per_chunk] optional.
    """
    pred = synthesize_chunk(params, cfg, token_ids, prev_mel, speaker)
    diff = pred - target_mel
    per = jnp.abs(diff) + diff ** 2
    if mask is not None:
        per = per * mask[..., None]
        denom = jnp.maximum(mask.sum() * cfg.n_mels, 1.0)
    else:
        denom = per.size
    return per.sum() / denom
