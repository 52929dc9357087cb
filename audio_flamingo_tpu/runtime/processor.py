"""Processor: chat templating + audio placeholder expansion + mel extraction.

Expansion reference: [hf] models/qwen2_audio/processing_qwen2_audio.py:117-166 — each
`<sound>` placeholder in the prompt text is replaced with N copies (N = encoder output
tokens for that clip) and wrapped in audio BOS/EOS markers BEFORE tokenization, so prefill
sees final length. Chat template: Qwen2 ChatML (<|im_start|>role\\n...<|im_end|>).

TPU delta: clips are padded to WHOLE 30 s windows (static shape buckets), so
N = num_windows * tokens_per_window exactly; no per-sample dynamic feature lengths.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from audio_flamingo_tpu.audio.mel import WhisperMelFrontend
from audio_flamingo_tpu.config import AF3Config, MelConfig
from audio_flamingo_tpu.runtime.tokenizer import BBPETokenizer

AUDIO_TOKEN = "<sound>"
AUDIO_BOS = "<|audio_bos|>"
AUDIO_EOS = "<|audio_eos|>"
IM_START = "<|im_start|>"
IM_END = "<|im_end|>"

# window buckets: compile-count control (SURVEY.md §7 "bucketed audio lengths");
# 30 = Music Flamingo full-song extended context (15 min)
WINDOW_BUCKETS = (1, 2, 4, 10, 20, 30)


def bucket_windows(n: int, buckets=WINDOW_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class AF3Processor:
    tokenizer: BBPETokenizer
    cfg: AF3Config
    frontend: WhisperMelFrontend = None  # type: ignore[assignment]
    system_prompt: str = "You are a helpful audio-understanding assistant."
    use_buckets: bool = True

    def __post_init__(self):
        if self.frontend is None:
            self.frontend = WhisperMelFrontend(
                MelConfig(num_mel_bins=self.cfg.encoder.num_mel_bins))

    # ------------------------------------------------------------------ chat template
    def apply_chat_template(self, messages: list[dict], add_generation_prompt: bool = True) -> str:
        """messages: [{'role': 'user'|'assistant'|'system', 'content': str}]. ChatML."""
        parts = []
        if messages and messages[0]["role"] != "system" and self.system_prompt:
            parts.append(f"{IM_START}system\n{self.system_prompt}{IM_END}\n")
        for m in messages:
            parts.append(f"{IM_START}{m['role']}\n{m['content']}{IM_END}\n")
        if add_generation_prompt:
            parts.append(f"{IM_START}assistant\n")
        return "".join(parts)

    # ------------------------------------------------------------ placeholder expansion
    def expand_audio_tokens(self, text: str, windows_per_clip: list[int]) -> str:
        """Replace each AUDIO_TOKEN with num_windows*tokens_per_window copies + bos/eos."""
        tpw = self.cfg.encoder.max_source_positions // self.cfg.encoder.pool_stride
        n_clips = text.count(AUDIO_TOKEN)
        if n_clips != len(windows_per_clip):
            raise ValueError(
                f"found {n_clips} {AUDIO_TOKEN} tokens but {len(windows_per_clip)} clips")
        out = []
        rest = text
        for nw in windows_per_clip:
            idx = rest.find(AUDIO_TOKEN)
            expanded = AUDIO_BOS + AUDIO_TOKEN * (nw * tpw) + AUDIO_EOS
            out.append(rest[:idx])
            out.append(expanded)
            rest = rest[idx + len(AUDIO_TOKEN):]
        out.append(rest)
        return "".join(out)

    # ------------------------------------------------------------------------ __call__
    def __call__(self, text: str | None = None, audios: list[np.ndarray] | None = None,
                 messages: list[dict] | None = None):
        """Returns {'ids': [1, T] int32, 'mels': [1, W, 3000, n_mels] f32 | None}.

        `text` is a raw prompt (may contain <sound>); `messages` uses the chat template.
        audios: list of mono 16 kHz float32 waveforms, one per <sound> occurrence.
        """
        if messages is not None:
            text = self.apply_chat_template(messages)
        assert text is not None
        mels = None
        if audios:
            windows, mel_list = [], []
            for wav in audios:
                nw = max(1, -(-len(wav) // self.frontend.window_samples))
                if self.use_buckets:
                    nw = bucket_windows(nw)
                padded = self.frontend.pad_or_trim(np.asarray(wav), num_windows=nw)
                m = np.asarray(self.frontend(padded[None]))  # [1, nw*3000, n_mels]
                mel_list.append(m.reshape(nw, -1, m.shape[-1]))
                windows.append(nw)
            text = self.expand_audio_tokens(text, windows)
            mels = np.concatenate(mel_list, axis=0)[None]  # [1, total_windows, 3000, M]
        ids = np.asarray([self.tokenizer.encode(text)], dtype=np.int32)
        return {"ids": ids, "mels": mels}
