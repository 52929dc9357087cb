"""AF1/AF2 processor: long audio -> sliding CLAP windows -> tower-ready mel stacks.

Behavior reference (SURVEY.md §2.1 long-audio row): AF2 handles up to 5 min by slicing
the waveform into 10 s CLAP windows (sliding, non-overlapping stride by default), each
encoded independently by the HTSAT tower; the window embeddings form the media sequence
the gated cross-attention consumes. Few-shot ICL (AF1) stacks multiple clips on a media
axis with per-token media ordinals (ops/xattn.media_mask).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from audio_flamingo_tpu.audio.clap_mel import ClapMelFrontend
from audio_flamingo_tpu.config import AF2Config
from audio_flamingo_tpu.runtime.tokenizer import BBPETokenizer

AUDIO_TOKEN = "<sound>"

# window-count buckets for 10 s CLAP windows (5 min = 30 windows)
CLAP_WINDOW_BUCKETS = (1, 2, 4, 8, 15, 30)


def bucket_clap_windows(n: int, buckets=CLAP_WINDOW_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class AF2Processor:
    tokenizer: BBPETokenizer
    cfg: AF2Config
    frontend: ClapMelFrontend = None  # type: ignore[assignment]
    system_prompt: str = "You are a helpful audio-understanding assistant."

    def __post_init__(self):
        if self.frontend is None:
            self.frontend = ClapMelFrontend(self.cfg.mel)

    def windows_for(self, wav: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Mono 48 kHz clip -> (mels [n_windows, C, T, n_mels], is_longer [n_windows]).

        Clips <= 10 s give one window; longer clips are sliced into consecutive 10 s
        windows (zero-padded tail), each processed like an independent clip.

        Every window is at most 10 s, so per-window processing is the frontend's
        short-clip branch (is_longer=False; fusion = 4 identical channels) — which
        lets ALL windows ride ONE batched `_db_mel` device call instead of a
        per-window host loop. Through the device tunnel the loop cost ~90 ms of
        dispatch+transfer PER WINDOW (2.6 s for a 5-min clip, measured round 4);
        batched it is one dispatch + one transfer."""
        import jax.numpy as jnp

        cfg = self.frontend.cfg
        max_s = self.frontend.max_samples
        n = max(1, -(-len(wav) // max_s))
        n = bucket_clap_windows(n)
        chunks = []
        for i in range(n):
            chunk = np.asarray(wav[i * max_s: (i + 1) * max_s], np.float32)
            if len(chunk) == 0:
                chunk = np.zeros(max_s, np.float32)
            chunks.append(self.frontend._pad_short(chunk))
        use_htk = cfg.truncation == "fusion"
        mel = np.asarray(self.frontend._db_mel(
            jnp.asarray(np.stack(chunks)), self.frontend.num_frames_max, use_htk))
        c = 4 if cfg.truncation == "fusion" else 1
        mels = np.repeat(mel[:, None], c, axis=1)          # [n, C, T, n_mels]
        return mels, np.zeros(n, bool)

    def windows_for_device(self, wav, out_dtype=None):
        """Device-resident `windows_for`: ONE host->device upload (the raw
        waveform), zero downloads — mels stay on device for the tower
        (VERDICT r4 #3: the host round-trip + re-upload was ~75% of AF2 TTFT,
        and the tunnel moves ~44 MB/s, so upload BYTES are the frontend floor).

        Accepts f32 waveforms, or int16 PCM (WAV's native sample format —
        half the upload bytes; dequantized x/32768 on device, bit-identical to
        a host `astype(f32)/32768`). Returns (mels [n, C, T, M] device,
        is_longer [n] device) matching `windows_for` numerically (same
        `_db_mel`, same `_pad_short` tiling — equality-tested)."""
        import jax
        import jax.numpy as jnp

        cfg = self.frontend.cfg
        max_s = self.frontend.max_samples
        true_len = int(wav.shape[0])
        n = bucket_clap_windows(max(1, -(-true_len // max_s)))
        if not isinstance(wav, jax.Array):
            wav = jax.device_put(np.ascontiguousarray(wav))  # the one upload
        if wav.dtype == jnp.int16:
            wav = wav.astype(jnp.float32) * (1.0 / 32768.0)
        use_htk = cfg.truncation == "fusion"
        chunks = self.frontend.window_chunks_device(
            wav.astype(jnp.float32), n, cfg.padding)
        mel = self.frontend._db_mel(chunks, self.frontend.num_frames_max,
                                    use_htk)
        if out_dtype is not None:
            mel = mel.astype(out_dtype)
        c = 4 if cfg.truncation == "fusion" else 1
        mels = jnp.broadcast_to(mel[:, None], (n, c) + mel.shape[1:])
        return mels, jnp.zeros(n, bool)

    def __call__(self, text: str | None = None, audios: list[np.ndarray] | None = None,
                 messages: list[dict] | None = None):
        """Returns {'ids': [1, T], 'mels': [n_media, n_windows, C, T, M] | None,
        'is_longer': ..., 'media_idx': [1, T]} — media_idx feeds Flamingo media masking."""
        if messages is not None:
            parts = []
            if messages[0]["role"] != "system" and self.system_prompt:
                parts.append(f"<|im_start|>system\n{self.system_prompt}<|im_end|>\n")
            for m in messages:
                parts.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
            parts.append("<|im_start|>assistant\n")
            text = "".join(parts)
        assert text is not None

        mels = longer = None
        if audios:
            per_clip = [self.windows_for(np.asarray(a, np.float32)) for a in audios]
            max_w = max(m.shape[0] for m, _ in per_clip)
            padded = []
            longer_rows = []
            for m, lg in per_clip:
                if m.shape[0] < max_w:
                    pad = np.zeros((max_w - m.shape[0],) + m.shape[1:], m.dtype)
                    m = np.concatenate([m, pad])
                    lg = np.concatenate([lg, np.zeros(max_w - len(lg), bool)])
                padded.append(m)
                longer_rows.append(lg)
            mels = np.stack(padded)          # [n_media, n_windows, C, T, M]
            longer = np.stack(longer_rows)

        ids = np.asarray([self.tokenizer.encode(text)], dtype=np.int32)
        # media ordinal per token: count of <sound> markers seen so far
        audio_id = self.tokenizer.special_tokens.get(AUDIO_TOKEN, -1)
        is_marker = (ids == audio_id).astype(np.int32)
        media_idx = np.cumsum(is_marker, axis=1)
        # the marker token itself "sees" its own clip
        return {"ids": ids, "mels": mels, "is_longer": longer, "media_idx": media_idx}
