"""Top-level user API: load a model, run wav -> text, multi-turn chat.

Public interface parity (SURVEY.md §1 L6): `load(model_id) -> model`;
`model.generate(sound, prompt, ...) -> text`; multi-turn chat with history
(static/af3_main_diagram-1.png chat panel); streaming token callback for the TTS head.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import af3
from audio_flamingo_tpu.ops.sampling import SamplingParams
from audio_flamingo_tpu.runtime import generate as gen
from audio_flamingo_tpu.runtime.processor import AF3Processor, AUDIO_TOKEN
from audio_flamingo_tpu.runtime.tokenizer import BBPETokenizer


@dataclass
class AudioFlamingo:
    """An AF3-family model ready for inference."""

    cfg: AF3Config
    params: dict
    processor: AF3Processor
    eos_token_id: int
    compute_dtype: object = jnp.bfloat16
    history: list = field(default_factory=list)
    # optional speculative-decoding draft (small LM sharing the tokenizer)
    draft_params: dict | None = None
    draft_cfg: object = None
    spec_k: int = 4

    # --------------------------------------------------------------------- generation
    THINK_INSTRUCTION = ("Please think and reason about the input audio before you "
                         "respond. Put your thoughts between <think> and </think>, then "
                         "give the final answer.")

    def generate(self, sound: np.ndarray | list[np.ndarray] | None = None,
                 prompt: str = "Describe the audio.", *, max_new_tokens: int = 256,
                 sampling: SamplingParams = SamplingParams(), seed: int = 0,
                 chat: bool = False, stream: bool = False, think: bool = False,
                 num_beams: int = 1, length_penalty: float = 1.0,
                 early_stopping=False):
        """sound: mono 16 kHz float32 waveform(s). Returns text (or a token iterator).

        think=True enables AF3's on-demand thinking (AF-Think prompt format,
        README.md:108): the model is asked to reason inside <think>...</think> first.
        num_beams>1 routes through runtime/beam.py (HF _beam_search parity,
        greedy beams; incompatible with stream/speculative).
        """
        audios = None
        text = prompt
        if sound is not None:
            audios = [sound] if isinstance(sound, np.ndarray) else list(sound)
            if AUDIO_TOKEN not in prompt:
                text = f"{AUDIO_TOKEN}{prompt}"
        if think:
            text = f"{text}\n{self.THINK_INSTRUCTION}"
        # chat history carries each turn's audio so placeholders in old turns stay
        # paired with their clips (prefill re-runs over the full history every turn)
        history_audios = [a for m in (self.history if chat else [])
                          for a in m.get("audios", [])]
        all_audios = history_audios + (audios or [])
        messages = ([{k: v for k, v in m.items() if k != "audios"}
                     for m in self.history] if chat else []) +             [{"role": "user", "content": text}]
        batch = self.processor(messages=messages, audios=all_audios or None)
        ids = jnp.asarray(batch["ids"])
        mels = jnp.asarray(batch["mels"]) if batch["mels"] is not None else None

        if num_beams > 1:
            assert not stream, "streaming and beam search are mutually exclusive"
            from audio_flamingo_tpu.runtime.beam import generate_beam

            seqs, _scores = generate_beam(
                self.params, self.cfg, ids, mels, num_beams=num_beams,
                max_new_tokens=max_new_tokens, eos_token_id=self.eos_token_id,
                length_penalty=length_penalty, early_stopping=early_stopping,
                compute_dtype=self.compute_dtype,
                min_new_tokens=sampling.min_new_tokens)
            seq = np.asarray(seqs)[0, 0].tolist()
            if self.eos_token_id in seq:
                seq = seq[: seq.index(self.eos_token_id) + 1]
            answer = self.processor.tokenizer.decode(seq, skip_special=True)
            if chat:
                self.history.append({"role": "user", "content": text,
                                     "audios": audios or []})
                self.history.append({"role": "assistant", "content": answer})
            return answer

        if stream:
            return self._stream(ids, mels, max_new_tokens, sampling, seed)

        # speculative routing requires repetition_penalty off in BOTH modes: the verify
        # step can't apply a history-dependent warp, and the non-draft greedy path DOES
        # apply it — so routing with a penalty would silently change outputs.
        speculate = (self.draft_params is not None and ids.shape[0] == 1
                     and sampling.repetition_penalty == 1.0)

        # token-bucket the prompt: one compiled prefill per bucket, not per length.
        # The speculative loops take the EXACT-length prompt instead (they have no
        # prompt_len plumbing; batch-1 interactive use trades one compile per
        # length for actually using the attached draft — previously any prompt
        # off a bucket boundary silently fell back to the plain path).
        from audio_flamingo_tpu.train.data import bucket_tokens

        t = ids.shape[1]
        bucket = bucket_tokens(t)
        prompt_len = None
        if bucket != t and not speculate:
            pad = jnp.full((ids.shape[0], bucket - t), self.eos_token_id, jnp.int32)
            ids = jnp.concatenate([ids, pad], axis=1)
            prompt_len = jnp.asarray(t, jnp.int32)

        if speculate:
            if sampling.greedy:
                from audio_flamingo_tpu.runtime.speculative import generate_speculative

                tokens, lengths = generate_speculative(
                    self.params, self.draft_params, self.cfg, self.draft_cfg, ids,
                    mels, k=self.spec_k, max_new_tokens=max_new_tokens,
                    eos_token_id=self.eos_token_id, compute_dtype=self.compute_dtype)
            else:
                # Leviathan rejection sampling: same marginal law as target-only
                # sampling (repetition penalty excluded — history-dependent p_t)
                from audio_flamingo_tpu.runtime.speculative import (
                    generate_speculative_sampled)

                tokens, lengths = generate_speculative_sampled(
                    self.params, self.draft_params, self.cfg, self.draft_cfg, ids,
                    mels, rng=jax.random.PRNGKey(seed), sampling=sampling,
                    k=self.spec_k, max_new_tokens=max_new_tokens,
                    eos_token_id=self.eos_token_id, compute_dtype=self.compute_dtype)
            out_ids = np.asarray(tokens)[0][: int(lengths[0])]
            answer = self.processor.tokenizer.decode(out_ids, skip_special=True)
            if chat:
                self.history.append({"role": "user", "content": text,
                                     "audios": audios or []})
                self.history.append({"role": "assistant", "content": answer})
            return answer

        tokens, lengths = gen.generate(
            self.params, self.cfg, ids, mels, max_new_tokens=max_new_tokens,
            eos_token_id=self.eos_token_id, sampling=sampling,
            rng=jax.random.PRNGKey(seed), compute_dtype=self.compute_dtype,
            prompt_len=prompt_len)
        out_ids = np.asarray(tokens)[0][: int(lengths[0])]
        answer = self.processor.tokenizer.decode(out_ids, skip_special=True)
        if chat:
            self.history.append({"role": "user", "content": text,
                                 "audios": audios or []})
            self.history.append({"role": "assistant", "content": answer})
        return answer

    def _stream(self, ids, mels, max_new_tokens, sampling, seed):
        for tok in gen.generate_stream(
                self.params, self.cfg, ids, mels, max_new_tokens=max_new_tokens,
                eos_token_id=self.eos_token_id, sampling=sampling,
                rng=jax.random.PRNGKey(seed), compute_dtype=self.compute_dtype):
            yield tok

    def reset_chat(self) -> None:
        self.history.clear()

    # ---------------------------------------------------------------------- factories
    @staticmethod
    def from_random(cfg: AF3Config | None = None, tokenizer: BBPETokenizer | None = None,
                    seed: int = 0, compute_dtype=jnp.float32) -> "AudioFlamingo":
        """Random-weight model (tests/benchmarks)."""
        cfg = cfg or AF3Config.tiny()
        params = af3.init(jax.random.PRNGKey(seed), cfg)
        if tokenizer is None:
            from audio_flamingo_tpu.runtime.tokenizer import train_bpe

            vocab, merges = train_bpe(["describe the sound of music and speech"],
                                      min(400, cfg.lm.vocab_size))
            tokenizer = BBPETokenizer(vocab, merges)
        import dataclasses

        cfg = dataclasses.replace(cfg, audio_token_id=tokenizer.special_tokens[AUDIO_TOKEN])
        proc = AF3Processor(tokenizer=tokenizer, cfg=cfg)
        eos = tokenizer.special_tokens.get("<|im_end|>", -1)
        return AudioFlamingo(cfg=cfg, params=params, processor=proc, eos_token_id=eos,
                             compute_dtype=compute_dtype)


@dataclass
class AudioFlamingo2:
    """AF1/AF2-family model: CLAP tower -> audio transform -> gated-xattn LM."""

    cfg: object                       # AF2Config (lm = Qwen2Config or OPTConfig)
    params: dict                      # flamingo params (audio_transform/xattn/lm)
    clap_params: dict
    clap_tower: object                # models.clap.ClapAudioTower
    processor: object                 # runtime.clap_processor.AF2Processor
    eos_token_id: int
    compute_dtype: object = jnp.float32
    history: list = field(default_factory=list)

    def encode_audio(self, mels: np.ndarray, is_longer: np.ndarray) -> jnp.ndarray:
        """[n_media, n_windows, C, T, M] mel stacks -> [1, n_media, n_windows, proj]."""
        nm, nw = mels.shape[:2]
        flat = jnp.asarray(mels.reshape((nm * nw,) + mels.shape[2:]))
        lg = jnp.asarray(is_longer.reshape(nm * nw, 1))
        out = self.clap_tower.encode(self.clap_params, flat, lg)
        return out["embeds"].reshape(1, nm, nw, -1)

    THINK_INSTRUCTION = AudioFlamingo.THINK_INSTRUCTION

    def generate(self, sound: np.ndarray | list[np.ndarray] | None = None,
                 prompt: str = "Describe the audio.", *, max_new_tokens: int = 128,
                 sampling: SamplingParams = SamplingParams(), seed: int = 0,
                 chat: bool = False, think: bool = False, num_beams: int = 1,
                 length_penalty: float = 1.0, early_stopping=False) -> str:
        from audio_flamingo_tpu.models import flamingo
        from audio_flamingo_tpu.runtime.clap_processor import AUDIO_TOKEN as CLAP_AT

        audios = None
        text = prompt
        if think:
            text = f"{text}\n{self.THINK_INSTRUCTION}"
        if sound is not None:
            audios = [sound] if isinstance(sound, np.ndarray) else list(sound)
            if CLAP_AT not in prompt:
                text = f"{CLAP_AT}{prompt}"
        history_audios = [a for m in (self.history if chat else [])
                          for a in m.get("audios", [])]
        all_audios = history_audios + (audios or [])
        messages = ([{k: v for k, v in m.items() if k != "audios"}
                     for m in self.history] if chat else []) +             [{"role": "user", "content": text}]
        batch = self.processor(messages=messages, audios=all_audios or None)
        if batch["mels"] is not None:
            wins = self.encode_audio(batch["mels"], batch["is_longer"])
        else:
            wins = jnp.zeros((1, 1, 1, self.cfg.audio_embed_dim), self.compute_dtype)
        from audio_flamingo_tpu.train.data import bucket_tokens

        ids = jnp.asarray(batch["ids"])
        t = ids.shape[1]
        bucket = bucket_tokens(t)
        prompt_len = None
        if bucket != t:
            ids = jnp.concatenate(
                [ids, jnp.full((1, bucket - t), self.eos_token_id, jnp.int32)], axis=1)
            prompt_len = jnp.asarray(t, jnp.int32)
        if num_beams > 1:
            from audio_flamingo_tpu.runtime.beam import generate_beam_xattn

            # beams run on the exact (unpadded) prompt: one compile per length
            seqs, _scores = generate_beam_xattn(
                self.params, self.cfg, jnp.asarray(batch["ids"]), wins,
                num_beams=num_beams, max_new_tokens=max_new_tokens,
                eos_token_id=self.eos_token_id, length_penalty=length_penalty,
                early_stopping=early_stopping, compute_dtype=self.compute_dtype,
                min_new_tokens=sampling.min_new_tokens)
            seq = np.asarray(seqs)[0, 0].tolist()
            if self.eos_token_id in seq:
                seq = seq[: seq.index(self.eos_token_id) + 1]
            out_ids = np.asarray(seq)
        else:
            tokens, lengths = flamingo.generate(
                self.params, self.cfg, ids, wins,
                max_new_tokens=max_new_tokens, eos_token_id=self.eos_token_id,
                sampling=sampling, rng=jax.random.PRNGKey(seed),
                compute_dtype=self.compute_dtype, prompt_len=prompt_len)
            out_ids = np.asarray(tokens)[0][: int(lengths[0])]
        answer = self.processor.tokenizer.decode(out_ids, skip_special=True)
        if chat:
            self.history.append({"role": "user", "content": text,
                                 "audios": audios or []})
            self.history.append({"role": "assistant", "content": answer})
        return answer

    def reset_chat(self) -> None:
        self.history.clear()

    @staticmethod
    def from_random(cfg=None, seed: int = 0, compute_dtype=jnp.float32,
                    clap_cfg=None) -> "AudioFlamingo2":
        import dataclasses

        from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, GatedXAttnConfig, Qwen2Config
        from audio_flamingo_tpu.models import clap as clap_mod
        from audio_flamingo_tpu.models import flamingo
        from audio_flamingo_tpu.models.clap import ClapAudioTower
        from audio_flamingo_tpu.runtime.clap_processor import AF2Processor
        from audio_flamingo_tpu.runtime.tokenizer import train_bpe

        cfg = cfg or AF2Config(
            lm=Qwen2Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                           num_layers=2, num_heads=4, num_kv_heads=2,
                           tie_word_embeddings=True),
            xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
        )
        clap_cfg = clap_cfg or ClapAudioConfig(enable_fusion=True)
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        params = flamingo.init(k1, cfg)
        clap_params = clap_mod.init(k2, clap_cfg)
        vocab, merges = train_bpe(["describe the sound of music"],
                                  min(400, cfg.lm.vocab_size))
        tokenizer = BBPETokenizer(vocab, merges)
        proc = AF2Processor(tokenizer=tokenizer, cfg=cfg)
        eos = tokenizer.special_tokens.get("<|im_end|>", -1)
        return AudioFlamingo2(cfg=cfg, params=params, clap_params=clap_params,
                              clap_tower=ClapAudioTower(clap_cfg), processor=proc,
                              eos_token_id=eos, compute_dtype=compute_dtype)


def _cast_f32_leaves(params: dict, compute_dtype) -> dict:
    """Cast f32 leaves to compute_dtype, EXCEPT quantization scales ('scale'/'gscale').

    The int8/int4 matmuls apply scales to the f32 partial product and document that
    step as exact (ops/pallas/quant4_matmul.py); a blanket bf16 cast would round every
    group scale to 8 mantissa bits and silently add ~0.3% relative weight error."""
    from jax.tree_util import DictKey, tree_map_with_path

    def cast(path, x):
        name = path[-1].key if path and isinstance(path[-1], DictKey) else None
        if name in ("scale", "gscale"):
            return jnp.asarray(x)
        return (jnp.asarray(x, compute_dtype)
                if np.asarray(x).dtype == np.float32 else jnp.asarray(x))

    return tree_map_with_path(cast, params)


def load(model_path: str, compute_dtype=jnp.bfloat16, *, quantize_lm: bool | str = False,
         use_flash: bool = True, a8_prefill: bool = False,
         a8_encoder: bool = False) -> AudioFlamingo:
    """Load an AF3-family checkpoint directory (HF '-hf' layout).

    Expects: config.json (qwen2_audio-style nesting), tokenizer.json (or vocab.json +
    merges.txt), model.safetensors[.index.json].
    quantize_lm=True (or "int8") converts LM weights to int8 on load (weight-only,
    per-channel) — required to fit the 7B LM on a single 16 GB chip;
    quantize_lm="int4" packs the layer linears to group-scale int4 (ops/quant4.py,
    half the decode weight bytes again; embed/lm_head stay int8). use_flash enables
    Pallas flash attention for the encoder and LM prefill. a8_prefill (requires int8):
    w8a8 prefill matmuls at the MXU's 2x int8 rate — a TTFT knob with a small
    accuracy band (ops/quant.q_matmul_a8); decode stays w8a16. a8_encoder:
    int8 encoder layer linears (w8a8 — the encoder is compute-bound, so this is
    the encode-phase half of the TTFT knob; ops/quant.quantize_encoder_params).
    """
    import json

    from audio_flamingo_tpu.io.hf_import import import_qwen2_audio
    from audio_flamingo_tpu.io.safetensors import load_checkpoint_dir
    from audio_flamingo_tpu.config import Qwen2Config, WhisperEncoderConfig

    with open(os.path.join(model_path, "config.json")) as f:
        raw = json.load(f)
    aud = raw.get("audio_config", {})
    txt = raw.get("text_config", {})
    cfg = AF3Config(
        encoder=WhisperEncoderConfig(
            num_mel_bins=aud.get("num_mel_bins", 128),
            d_model=aud.get("d_model", 1280),
            num_layers=aud.get("encoder_layers", 32),
            num_heads=aud.get("encoder_attention_heads", 20),
            ffn_dim=aud.get("encoder_ffn_dim", 5120),
            max_source_positions=aud.get("max_source_positions", 1500),
        ),
        lm=Qwen2Config(
            vocab_size=txt.get("vocab_size", 152_064),
            hidden_size=txt.get("hidden_size", 3584),
            intermediate_size=txt.get("intermediate_size", 18_944),
            num_layers=txt.get("num_hidden_layers", 28),
            num_heads=txt.get("num_attention_heads", 28),
            num_kv_heads=txt.get("num_key_value_heads", 4),
            rope_theta=txt.get("rope_theta", 1e6),
            tie_word_embeddings=txt.get("tie_word_embeddings", False),
            # HF nulls sliding_window unless use_sliding_window
            # ([hf] configuration_qwen2.py:181); per-layer gate via max_window_layers
            sliding_window=(txt.get("sliding_window", None)
                            if txt.get("use_sliding_window", False) else None),
            max_window_layers=txt.get("max_window_layers", 0),
        ),
        audio_token_id=raw.get("audio_token_id", raw.get("audio_token_index", 151_646)),
    )
    if use_flash or a8_prefill:
        import dataclasses

        assert not a8_prefill or quantize_lm in (True, "int8"), \
            "a8_prefill requires quantize_lm=True/'int8' (w8a8 has no int4 MXU mode)"
        cfg = dataclasses.replace(
            cfg, encoder=dataclasses.replace(cfg.encoder, use_flash=use_flash),
            lm=dataclasses.replace(cfg.lm, use_flash=use_flash,
                                   a8_prefill=a8_prefill))
    sd = load_checkpoint_dir(model_path)
    params = import_qwen2_audio(sd, cfg)
    if quantize_lm == "int4":
        from audio_flamingo_tpu.ops.quant4 import quantize_lm_params_w4

        params["lm"] = quantize_lm_params_w4(
            jax.tree.map(jnp.asarray, params["lm"]))
    elif quantize_lm:
        from audio_flamingo_tpu.ops.quant import quantize_lm_params

        params["lm"] = quantize_lm_params(
            jax.tree.map(jnp.asarray, params["lm"]))
    if a8_encoder:
        from audio_flamingo_tpu.ops.quant import quantize_encoder_params

        params["encoder"] = quantize_encoder_params(
            jax.tree.map(jnp.asarray, params["encoder"]))
    params = _cast_f32_leaves(params, compute_dtype)
    tokenizer = BBPETokenizer.from_pretrained_dir(model_path)
    proc = AF3Processor(tokenizer=tokenizer, cfg=cfg)
    eos = tokenizer.special_tokens.get("<|im_end|>", -1)
    return AudioFlamingo(cfg=cfg, params=params, processor=proc, eos_token_id=eos,
                         compute_dtype=compute_dtype)


def load_draft(model_path: str, compute_dtype=jnp.bfloat16, *,
               quantize: bool = False):
    """Load a plain Qwen2 CausalLM checkpoint directory as a speculative DRAFT.

    The draft must share the target's tokenizer (e.g. Qwen2.5-0.5B next to the
    AF3 7B backbone — same Qwen2 vocab); only token ids flow into it, so any
    AF family can use it. Returns (draft_params, draft_cfg) ready for
    `AudioFlamingo(draft_params=..., draft_cfg=...)` (batch-1 loop) or any
    serving engine's `draft_params=`/`draft_cfg=` knobs (batched greedy AND
    Leviathan sampled speculation). quantize=True stores the draft w8a16 —
    at small batch the draft round is layer-latency bound, but int8 halves its
    weight stream (bench.py spec notes).
    """
    import json

    from audio_flamingo_tpu.config import Qwen2Config
    from audio_flamingo_tpu.io.hf_import import import_qwen2
    from audio_flamingo_tpu.io.safetensors import load_checkpoint_dir

    with open(os.path.join(model_path, "config.json")) as f:
        raw = json.load(f)
    txt = raw.get("text_config", raw)      # plain Qwen2 configs are top-level
    cfg = Qwen2Config(
        vocab_size=txt.get("vocab_size", 151_936),
        hidden_size=txt["hidden_size"],
        intermediate_size=txt["intermediate_size"],
        num_layers=txt["num_hidden_layers"],
        num_heads=txt["num_attention_heads"],
        num_kv_heads=txt.get("num_key_value_heads", txt["num_attention_heads"]),
        rope_theta=txt.get("rope_theta", 1e6),
        # HF Qwen2Config defaults tie_word_embeddings to False — an untied
        # checkpoint omitting the key must NOT lose its lm_head (the Qwen2.5
        # small models that tie set the key explicitly)
        tie_word_embeddings=txt.get("tie_word_embeddings", False),
        sliding_window=(txt.get("sliding_window", None)
                        if txt.get("use_sliding_window", False) else None),
        max_window_layers=txt.get("max_window_layers", 0),
    )
    sd = load_checkpoint_dir(model_path)
    params = import_qwen2(sd, cfg)
    if quantize:
        from audio_flamingo_tpu.ops.quant import quantize_lm_params

        params = quantize_lm_params(jax.tree.map(jnp.asarray, params))
    return _cast_f32_leaves(params, compute_dtype), cfg


def save_af2(path: str, model: "AudioFlamingo2") -> None:
    """Persist an AF1/AF2-family model (flamingo params + CLAP tower + tokenizer)."""
    import json as _json

    from audio_flamingo_tpu.train.checkpoints import export_safetensors

    os.makedirs(path, exist_ok=True)
    export_safetensors(os.path.join(path, "flamingo.safetensors"), model.params)
    export_safetensors(os.path.join(path, "clap.safetensors"), model.clap_params)
    from audio_flamingo_tpu.config import asdict

    with open(os.path.join(path, "config.json"), "w") as f:
        _json.dump({"af2": asdict(model.cfg), "clap": asdict(model.clap_tower.cfg),
                    "lm_family": "opt" if type(model.cfg.lm).__name__ == "OPTConfig"
                    else "qwen2"}, f, indent=1)
    tok = model.processor.tokenizer
    with open(os.path.join(path, "vocab.json"), "w") as f:
        _json.dump(tok.vocab, f)
    with open(os.path.join(path, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        for a, b in tok.merges:
            f.write(f"{a} {b}\n")


def load_af2(path: str, compute_dtype=jnp.float32) -> "AudioFlamingo2":
    """Load an AF1/AF2-family model saved by save_af2."""
    import json as _json

    from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, ClapMelConfig, \
        GatedXAttnConfig, OPTConfig, Qwen2Config
    from audio_flamingo_tpu.models import clap as clap_mod
    from audio_flamingo_tpu.models import flamingo
    from audio_flamingo_tpu.models.clap import ClapAudioTower
    from audio_flamingo_tpu.runtime.clap_processor import AF2Processor
    from audio_flamingo_tpu.train.checkpoints import import_safetensors

    with open(os.path.join(path, "config.json")) as f:
        raw = _json.load(f)
    lm_cls = OPTConfig if raw.get("lm_family") == "opt" else Qwen2Config
    a = raw["af2"]
    for key in ("depths", "num_heads"):
        if key in a["clap"]:
            a["clap"][key] = tuple(a["clap"][key])
    cfg = AF2Config(clap=ClapAudioConfig(**a["clap"]), lm=lm_cls(**a["lm"]),
                    xattn=GatedXAttnConfig(**a["xattn"]),
                    num_audio_transform_layers=a["num_audio_transform_layers"],
                    audio_embed_dim=a["audio_embed_dim"],
                    mel=ClapMelConfig(**a["mel"]))
    c = raw["clap"]
    for key in ("depths", "num_heads"):
        c[key] = tuple(c[key])
    clap_cfg = ClapAudioConfig(**c)

    params_t = flamingo.init(jax.random.PRNGKey(0), cfg)
    clap_t = clap_mod.init(jax.random.PRNGKey(0), clap_cfg)
    params = import_safetensors(os.path.join(path, "flamingo.safetensors"), params_t)
    clap_params = import_safetensors(os.path.join(path, "clap.safetensors"), clap_t)
    tokenizer = BBPETokenizer.from_pretrained_dir(path)
    proc = AF2Processor(tokenizer=tokenizer, cfg=cfg)
    eos = tokenizer.special_tokens.get("<|im_end|>", -1)
    return AudioFlamingo2(cfg=cfg, params=params, clap_params=clap_params,
                          clap_tower=ClapAudioTower(clap_cfg), processor=proc,
                          eos_token_id=eos, compute_dtype=compute_dtype)
