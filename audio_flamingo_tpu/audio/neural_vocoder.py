"""Neural mel->waveform vocoder: HiFi-GAN-style generator, TPU-native.

Production voice-output path behind the streaming TTS head (reference ships a
trained streaming TTS module, README.md:109; the branch code is unmounted so this
is an original TPU-first design). Generator-only: trained with the Parallel-
WaveGAN-style auxiliary objective (multi-resolution STFT loss + waveform L1) on a
procedurally generated speech-like corpus — self-contained in this no-network
environment, and the training loop doubles as the fine-tune path for real data.

TPU-first design notes:
- every conv is an NWC `conv_general_dilated` (XLA tiles them onto the MXU);
- upsampling is a transposed conv expressed via `lhs_dilation` (no gather);
- static shapes; the whole generator jits to one fused program;
- streaming: `stream_synthesize` emits chunk-by-chunk with a receptive-field
  overlap and matches the full-utterance pass exactly in the interior.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.audio.clap_mel import frame_signal
from audio_flamingo_tpu.audio.mel import _windowed_dft_basis, mel_filter_bank


@dataclass(frozen=True)
class VocoderConfig:
    n_mels: int = 80
    hop: int = 160                       # total upsampling factor (== mel hop)
    upsample: tuple = (5, 4, 4, 2)       # per-stage strides; product == hop
    channels: int = 192                  # width before the first upsample
    res_kernels: tuple = (3, 7)          # multi-receptive-field kernel sizes
    res_dilations: tuple = (1, 3)
    sr: int = 16_000
    n_fft: int = 400                     # analysis params for mel_spectrogram
    # harmonic (NSF-style) source: a sine stack at the predicted per-frame F0
    # injected at every upsample stage — a bare CNN upsampler has to invent
    # periodicity from nothing, which is exactly the round-3 failure mode
    # (held-out F0 MAE 98 Hz, VERDICT r3 #8/Missing #5); with an explicit
    # source the generator only shapes an already-pitched excitation
    harmonics: int = 8
    f0_min: float = 60.0
    f0_span: float = 440.0               # f0 = f0_min + f0_span * sigmoid(raw)

    def stage_channels(self, i: int) -> int:
        return max(self.channels // (2 ** (i + 1)), 8)

    @property
    def receptive_frames(self) -> int:
        """Mel frames of one-sided receptive field (for streaming overlap).

        pre conv k=7 contributes +-3 frames; each stage adds its transposed-conv
        reach plus the widest res block (k=7: +-3 dil 1 then +-9 dil 3 = +-12)
        divided back to frame rate by the cumulative upsample factor:
        3 + (2 + 12)/5 + 14/20 + 14/80 + 14/160 ~= 6.7; 12 over-covers."""
        return 12


def _conv_init(rng, k, cin, cout):
    scale = (1.0 / (k * cin)) ** 0.5
    return {"w": jax.random.uniform(rng, (k, cin, cout), jnp.float32, -scale, scale),
            "b": jnp.zeros((cout,), jnp.float32)}


def init(rng: jax.Array, cfg: VocoderConfig, harmonic: bool = True) -> dict:
    n_stages = len(cfg.upsample)
    keys = iter(jax.random.split(rng, 7 + n_stages * (2 + 2 * len(cfg.res_kernels)
                                                      * len(cfg.res_dilations))))
    params = {"pre": _conv_init(next(keys), 7, cfg.n_mels, cfg.channels)}
    ups, res, src = [], [], []
    cin = cfg.channels
    for i, u in enumerate(cfg.upsample):
        cout = cfg.stage_channels(i)
        ups.append(_conv_init(next(keys), 2 * u, cin, cout))
        src.append(_conv_init(next(keys), 1, 1, cout))
        blocks = []
        for k in cfg.res_kernels:
            for d in cfg.res_dilations:
                blocks.append({"c1": _conv_init(next(keys), k, cout, cout),
                               "c2": _conv_init(next(keys), k, cout, cout)})
        res.append(blocks)
        cin = cout
    params["ups"] = ups
    params["res"] = res
    params["post"] = _conv_init(next(keys), 7, cin, 1)
    if harmonic:
        # per-frame F0 + voicing predicted from the mel itself (receptive
        # field +-4 frames, well inside the streaming ctx overlap)
        params["f0_head"] = {"c1": _conv_init(next(keys), 5, cfg.n_mels, 64),
                             "c2": _conv_init(next(keys), 5, 64, 2)}
        params["src"] = src
    return params


def predict_f0(params: dict, cfg: VocoderConfig, log_mel: jnp.ndarray):
    """[B, F, n_mels] -> (f0_hz [B, F], voiced [B, F] in (0, 1))."""
    h = _leaky(_conv(log_mel, params["f0_head"]["c1"]))
    out = _conv(h, params["f0_head"]["c2"])
    f0 = cfg.f0_min + cfg.f0_span * jax.nn.sigmoid(out[..., 0])
    return f0, jax.nn.sigmoid(out[..., 1])


def _harmonic_source(cfg: VocoderConfig, f0: jnp.ndarray, voiced: jnp.ndarray,
                     phase0: jnp.ndarray | None) -> jnp.ndarray:
    """Sine-stack excitation at f0: [B, F] -> [B, F*hop].

    Phase is frame-structured: frame j starts at phase0 + cumsum of the
    per-frame increments 2*pi*f0*hop/sr, and advances linearly within the
    frame — so a streaming caller can carry the scalar frame-base phase across
    chunks (stream_synthesize). mod 2*pi before the harmonic multiply keeps
    the f32 sin argument small (sin(h*(phi - 2*pi*k)) == sin(h*phi))."""
    b, frames = f0.shape
    inc = 2.0 * jnp.pi * f0 * (cfg.hop / cfg.sr)                 # [B, F]
    # exclusive cumsum with PROGRESSIVE 2*pi wrapping (hierarchical: exact
    # within a chunk, chunk totals pre-modded before the outer cumsum). A
    # plain f32 cumsum reaches ~1e5 rad on multi-minute single-shot apply()
    # calls where f32 spacing is >0.01 rad, audibly degrading source pitch
    # (ADVICE r4 #3; sin(h*(phi mod 2*pi)) == sin(h*phi) for integer h, so
    # wrapping is exact). Streaming is unaffected (host-f64 phase carry).
    chunk = 256
    pad = (-frames) % chunk
    inc_p = jnp.pad(jnp.mod(inc, 2.0 * jnp.pi), ((0, 0), (0, pad)))
    inc_c = inc_p.reshape(b, -1, chunk)
    within = jnp.cumsum(inc_c, axis=2) - inc_c                   # < chunk*2*pi
    tot = jnp.mod(jnp.sum(inc_c, axis=2), 2.0 * jnp.pi)          # [B, n]
    cbase = jnp.mod(jnp.cumsum(tot, axis=1) - tot, 2.0 * jnp.pi)
    base = jnp.mod(cbase[..., None] + within, 2.0 * jnp.pi)
    base = base.reshape(b, -1)[:, :frames]                       # exclusive
    if phase0 is not None:
        base = base + phase0[:, None]
    step = 2.0 * jnp.pi * f0[..., None] / cfg.sr                 # per-sample
    within = step * (1.0 + jnp.arange(cfg.hop, dtype=jnp.float32))
    phase = jnp.mod(base[..., None] + within, 2.0 * jnp.pi)      # [B, F, hop]
    hs = jnp.arange(1, cfg.harmonics + 1, dtype=jnp.float32)
    amps = 1.0 / hs
    src = jnp.sin(phase[..., None] * hs) @ amps                  # [B, F, hop]
    src = src * voiced[..., None] * (0.3 / math.log(cfg.harmonics + 1))
    return src.reshape(b, frames * cfg.hop)


def _conv(x, p, *, dilation: int = 1):
    """NWC same-padded conv."""
    k = p["w"].shape[0]
    pad = (k - 1) * dilation // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NWC", "WIO", "NWC"))
    y = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype), (1,),
                                     ((pad, (k - 1) * dilation - pad),),
                                     rhs_dilation=(dilation,), dimension_numbers=dn)
    return y + p["b"].astype(x.dtype)


def _conv_transpose(x, p, stride: int):
    """Stride-u transposed conv with kernel 2u (output length = input*u)."""
    k = p["w"].shape[0]
    dn = jax.lax.conv_dimension_numbers(x.shape, p["w"].shape, ("NWC", "WIO", "NWC"))
    pad = k - 1 - (stride // 2)
    y = jax.lax.conv_general_dilated(x, p["w"].astype(x.dtype), (1,),
                                     ((pad, k - 1 - pad + stride - 1),),
                                     lhs_dilation=(stride,), dimension_numbers=dn)
    return y[:, : x.shape[1] * stride] + p["b"].astype(x.dtype)


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


@partial(jax.jit, static_argnames=("cfg",))
def apply(params: dict, cfg: VocoderConfig, log_mel: jnp.ndarray,
          phase0: jnp.ndarray | None = None) -> jnp.ndarray:
    """[B, frames, n_mels] log10-mel -> waveform [B, frames*hop] in (-1, 1).

    With the harmonic layout ('f0_head' in params) a sine-stack source at the
    predicted F0 is average-pooled to each stage's rate and injected through a
    1x1 conv after every upsample — the generator shapes a pitched excitation
    instead of inventing periodicity (NSF-style; VERDICT r3 #8). phase0 [B]:
    frame-base phase carried across streaming chunks."""
    harmonic = "f0_head" in params
    src = None
    if harmonic:
        f0, voiced = predict_f0(params, cfg, log_mel)
        # NSF recipe: the excitation is an INPUT signal, not a differentiable
        # path — d(wav)/d(f0) through sin(cumsum(f0)) grows with time and its
        # chaotic gradients fight the direct F0 supervision in `loss`
        # (measured: joint training oscillates, f0 error never converges)
        f0 = jax.lax.stop_gradient(f0)
        voiced = jax.lax.stop_gradient(voiced)
        src = _harmonic_source(cfg, f0, voiced, phase0)[..., None]  # [B,T,1]
    x = _conv(log_mel, params["pre"])
    rate = 1
    for i, u in enumerate(cfg.upsample):
        x = _conv_transpose(_leaky(x), params["ups"][i], u)
        rate *= u
        if harmonic:
            pool = cfg.hop // rate
            b, t1, _ = src.shape
            s_i = src.reshape(b, t1 // pool, pool).mean(-1)[..., None] \
                if pool > 1 else src
            x = x + _conv(s_i.astype(x.dtype), params["src"][i])
        acc = None
        for blk in params["res"][i]:
            # two stacked dilated convs per multi-receptive-field block
            h = x + _conv(_leaky(_conv(_leaky(x), blk["c1"],
                                       dilation=cfg.res_dilations[0])),
                          blk["c2"], dilation=cfg.res_dilations[-1])
            acc = h if acc is None else acc + h
        x = acc / len(params["res"][i])
    wav = jnp.tanh(_conv(_leaky(x), params["post"]))
    return wav[..., 0]


# --------------------------------------------------------------------------------------
# Analysis side: mel_spectrogram matching GriffinLim's conventions (log10, slaney)
# --------------------------------------------------------------------------------------


class VocoderMel:
    """wav -> [frames, n_mels] log10-mel with the SAME filterbank/scale GriffinLim
    inverts — so Griffin-Lim and the neural vocoder are drop-in alternatives."""

    def __init__(self, cfg: VocoderConfig = VocoderConfig(),
                 fmin: float = 0.0, fmax: float = 8000.0):
        self.cfg = cfg
        mel = mel_filter_bank(cfg.n_fft // 2 + 1, cfg.n_mels, fmin, fmax, cfg.sr)
        self.mel = jnp.asarray(mel, jnp.float32)
        c, s = _windowed_dft_basis(cfg.n_fft)
        self.C = jnp.asarray(c, jnp.float32)
        self.S = jnp.asarray(s, jnp.float32)

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav [B, T] (T a multiple of hop) -> [B, T//hop, n_mels]."""
        cfg = self.cfg
        num_frames = wav.shape[-1] // cfg.hop
        half = cfg.n_fft // 2
        padded = jnp.pad(wav, ((0, 0), (half, half)), mode="reflect")
        frames = frame_signal(padded, cfg.n_fft, cfg.hop, num_frames)
        power = (frames @ self.C) ** 2 + (frames @ self.S) ** 2
        melspec = jnp.maximum(power @ self.mel, 1e-10)
        return jnp.log10(melspec)


# --------------------------------------------------------------------------------------
# Training: multi-resolution STFT + waveform loss on a synthetic voice-like corpus
# --------------------------------------------------------------------------------------

_STFT_RESOLUTIONS = ((512, 128), (1024, 256), (256, 64))


def _stft_mag(wav: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    num_frames = (wav.shape[-1] - n_fft) // hop + 1
    frames = frame_signal(wav, n_fft, hop, num_frames)
    win = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)


def multires_stft_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Parallel-WaveGAN auxiliary loss: spectral convergence + log-magnitude L1."""
    total = 0.0
    for n_fft, hop in _STFT_RESOLUTIONS:
        pm = _stft_mag(pred, n_fft, hop)
        tm = _stft_mag(target, n_fft, hop)
        sc = jnp.linalg.norm(pm - tm) / jnp.maximum(jnp.linalg.norm(tm), 1e-6)
        mag = jnp.mean(jnp.abs(jnp.log(pm) - jnp.log(tm)))
        total = total + sc + mag
    return total / len(_STFT_RESOLUTIONS)


def loss(params: dict, cfg: VocoderConfig, log_mel: jnp.ndarray,
         target_wav: jnp.ndarray, f0_target: jnp.ndarray | None = None,
         voiced_target: jnp.ndarray | None = None) -> jnp.ndarray:
    """Multi-res STFT + L1; with the harmonic layout and per-frame targets
    (f0_track on the corpus wav), the F0 head gets direct supervision —
    normalized-|Δf0| over voiced frames + BCE on the voicing gate."""
    pred = apply(params, cfg, log_mel)
    total = multires_stft_loss(pred, target_wav) + \
        2.0 * jnp.mean(jnp.abs(pred - target_wav))
    if f0_target is not None and "f0_head" in params:
        f0, voiced = predict_f0(params, cfg, log_mel)
        vm = voiced_target.astype(jnp.float32)
        nv_ = jnp.maximum(vm.sum(), 1.0)
        total += 2.0 * (jnp.abs(f0 - f0_target) / cfg.f0_span * vm).sum() / nv_
        bce = -(vm * jnp.log(voiced + 1e-6)
                + (1 - vm) * jnp.log(1 - voiced + 1e-6))
        total += 0.2 * bce.mean()
    return total


def f0_track(wav: np.ndarray, sr: int = 16_000, hop: int = 160,
             frames: int | None = None, fmin: float = 60.0,
             fmax: float = 420.0) -> tuple[np.ndarray, np.ndarray]:
    """Per-mel-frame autocorrelation pitch: wav -> (f0 [frames], voiced [frames]).

    Window 40 ms centered on each frame's hop position; unvoiced/silent frames
    get f0=0, voiced=False (estimate_f0's criterion per frame)."""
    if frames is None:
        frames = len(wav) // hop
    win = int(0.04 * sr)
    lo, hi = int(sr / fmax), int(sr / fmin)
    f0 = np.zeros(frames, np.float32)
    voiced = np.zeros(frames, bool)
    padded = np.pad(wav, (win // 2, win))
    for j in range(frames):
        x = padded[j * hop: j * hop + win].astype(np.float64)
        x = x - x.mean()
        if np.max(np.abs(x)) < 1e-3:
            continue
        ac = np.correlate(x, x, mode="full")[win - 1:]
        seg = ac[lo:hi]
        if seg.size == 0 or ac[0] <= 0:
            continue
        lag = lo + int(np.argmax(seg))
        if ac[lag] / ac[0] > 0.3:
            f0[j] = sr / lag
            voiced[j] = True
    return f0, voiced


def speaker_spec(spk_id: int) -> dict:
    """Deterministic per-speaker voice parameters: f0 base + 3 formant resonances.

    Formant ranges span male->female->child-like voices; speaker identity is a
    STABLE (f0, F1-F3, rolloff) tuple, while utterances vary prosody/segments —
    the structure the speaker-separation and intelligibility gates need."""
    r = np.random.default_rng(1000 + spk_id)
    return {
        "f0": float(r.uniform(85.0, 280.0)),
        "formants": np.array([r.uniform(300, 850), r.uniform(900, 2300),
                              r.uniform(2400, 3200)], np.float32),
        "bw": np.array([r.uniform(60, 110), r.uniform(90, 160),
                        r.uniform(120, 220)], np.float32),
        "rolloff": float(r.uniform(0.6, 1.1)),
    }


# vowel-like formant targets (F1, F2) the sentence generator moves between
_VOWELS = np.array([[730, 1090], [270, 2290], [300, 870], [530, 1840], [660, 1720]],
                   np.float32)


def synthetic_sentence(rng: np.random.Generator, spk: dict, seconds: float,
                       sr: int = 16_000) -> np.ndarray:
    """One speech-like 'sentence' for a speaker: a sequence of vowel segments with
    per-segment formant targets (interpolated), f0 declination + vibrato, amplitude
    envelope with syllable structure, and breath noise."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    n_seg = max(2, int(seconds / 0.12))
    seg_ids = rng.integers(0, len(_VOWELS), n_seg)
    # piecewise-constant formant targets -> smooth trajectories
    bounds = np.linspace(0, n, n_seg + 1).astype(int)
    f1 = np.empty(n, np.float32)
    f2 = np.empty(n, np.float32)
    env = np.empty(n, np.float32)
    for i in range(n_seg):
        sl = slice(bounds[i], bounds[i + 1])
        v = _VOWELS[seg_ids[i]]
        scale = spk["formants"][0] / 500.0   # speaker's vocal-tract scaling
        f1[sl], f2[sl] = v[0] * scale, v[1] * scale
        env[sl] = rng.uniform(0.45, 1.0)     # syllable stress
    k = int(0.02 * sr) | 1
    kernel = np.hanning(k)
    kernel /= kernel.sum()
    f1 = np.convolve(f1, kernel, mode="same")
    f2 = np.convolve(f2, kernel, mode="same")
    env = np.convolve(env, kernel, mode="same")

    f0 = spk["f0"] * (1.06 - 0.12 * t / max(seconds, 1e-3))       # declination
    f0 = f0 * (1.0 + 0.008 * np.sin(2 * np.pi * rng.uniform(4.5, 6.5) * t))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    wav = np.zeros(n, np.float32)
    f3, bw = float(spk["formants"][2]), spk["bw"]
    for h in range(1, 16):
        fh = h * spk["f0"]
        if fh > sr / 2 - 200:
            break
        res = (1.0 / (1 + ((fh - f1) / bw[0]) ** 2)
               + 0.7 / (1 + ((fh - f2) / bw[1]) ** 2)
               + 0.3 / (1 + ((fh - f3) / bw[2]) ** 2))
        wav += (h ** -spk["rolloff"]) * res * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    wav = wav * env + 0.008 * rng.normal(size=n)
    return (0.6 * wav / max(np.max(np.abs(wav)), 1e-6)).astype(np.float32)


def synthetic_speaker_batch(rng: np.random.Generator, spk_ids, seconds: float,
                            sr: int = 16_000) -> np.ndarray:
    """[len(spk_ids), T] sentences, one per requested speaker id."""
    return np.stack([synthetic_sentence(rng, speaker_spec(int(s)), seconds, sr)
                     for s in spk_ids])


def synthetic_voice_batch(rng: np.random.Generator, batch: int, seconds: float,
                          sr: int = 16_000) -> tuple[np.ndarray, np.ndarray]:
    """Procedural speech-like corpus: harmonic stacks with vibrato + drifting f0,
    spectral rolloff, amplitude envelope, and breath noise. Returns (wav [B,T], f0 [B])."""
    t = np.arange(int(seconds * sr)) / sr
    wavs, f0s = [], []
    for _ in range(batch):
        f0 = rng.uniform(90.0, 320.0)
        vib = 1.0 + 0.01 * np.sin(2 * np.pi * rng.uniform(4, 7) * t)
        drift = 1.0 + 0.03 * np.sin(2 * np.pi * rng.uniform(0.3, 1.0) * t)
        phase = 2 * np.pi * np.cumsum(f0 * vib * drift) / sr
        wav = np.zeros_like(t)
        for h in range(1, 12):
            if h * f0 > sr / 2 - 200:
                break
            amp = h ** -rng.uniform(0.8, 1.6)
            wav += amp * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
        env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t
                                        + rng.uniform(0, np.pi)))
        wav = wav * env + 0.01 * rng.normal(size=t.shape)
        wav = 0.6 * wav / np.max(np.abs(wav))
        wavs.append(wav.astype(np.float32))
        f0s.append(f0)
    return np.stack(wavs), np.asarray(f0s, np.float32)


def train(rng: jax.Array, cfg: VocoderConfig, *, steps: int = 300, batch: int = 8,
          seconds: float = 0.5, lr: float = 2e-4, seed: int = 0,
          log_every: int = 0, corpus: str = "speakers",
          num_speakers: int = 8) -> tuple[dict, list[float]]:
    """Train the generator on the synthetic corpus. Returns (params, loss history).

    corpus="speakers" (default): multi-speaker formant sentences
    (synthetic_speaker_batch — varied vocal tracts, the round-3 quality push);
    corpus="voice": the round-2 single-style harmonic corpus;
    corpus="mixed": alternate batches of both — the F0 head must cover BOTH
    pitch distributions (speakers tops out ~280 Hz; the held-out eval corpus
    reaches 320 Hz — a speakers-only head saturates there and the harmonic
    source drives the generator an octave off, the round-4 48 Hz-MAE failure)."""
    import optax

    params = init(rng, cfg)
    mel_fe = VocoderMel(cfg)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    harmonic = "f0_head" in params

    @jax.jit
    def update(params, opt_state, mels, wavs, f0t, vt):
        l, grads = jax.value_and_grad(loss)(params, cfg, mels, wavs, f0t, vt)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    np_rng = np.random.default_rng(seed)
    history = []
    for step in range(steps):
        kind = corpus if corpus != "mixed" else \
            ("speakers" if step % 2 == 0 else "voice")
        if kind == "speakers":
            wavs = synthetic_speaker_batch(
                np_rng, np_rng.integers(0, num_speakers, batch), seconds, cfg.sr)
        else:
            wavs, _ = synthetic_voice_batch(np_rng, batch, seconds, cfg.sr)
        wavs_j = jnp.asarray(wavs)
        mels = mel_fe(wavs_j)
        if harmonic:
            tracks = [f0_track(w, cfg.sr, cfg.hop) for w in wavs]
            f0t = jnp.asarray(np.stack([t[0] for t in tracks]))
            vt = jnp.asarray(np.stack([t[1] for t in tracks]))
        else:
            f0t = vt = None
        params, opt_state, l = update(params, opt_state, mels, wavs_j, f0t, vt)
        history.append(float(l))
        if log_every and step % log_every == 0:
            print(f"vocoder step {step}: loss {float(l):.4f}", flush=True)
    return params, history


# --------------------------------------------------------------------------------------
# Objective evaluation: mel reconstruction MSE + F0 tracking on a held-out corpus
# --------------------------------------------------------------------------------------


def estimate_f0(wav: np.ndarray, sr: int = 16_000,
                fmin: float = 60.0, fmax: float = 420.0) -> float:
    """Median autocorrelation pitch over 40 ms frames (voiced synthetic signals)."""
    frame, hop = int(0.04 * sr), int(0.02 * sr)
    lo, hi = int(sr / fmax), int(sr / fmin)
    f0s = []
    for start in range(0, len(wav) - frame, hop):
        x = wav[start: start + frame]
        x = x - x.mean()
        if np.max(np.abs(x)) < 1e-3:
            continue
        ac = np.correlate(x, x, mode="full")[frame - 1:]
        seg = ac[lo:hi]
        if seg.size == 0 or ac[0] <= 0:
            continue
        lag = lo + int(np.argmax(seg))
        if ac[lag] / ac[0] > 0.3:
            f0s.append(sr / lag)
    return float(np.median(f0s)) if f0s else 0.0


def evaluate(params: dict, cfg: VocoderConfig, *, n: int = 8, seconds: float = 0.5,
             seed: int = 123) -> dict:
    """Held-out objective eval: {mel_mse, f0_mae_hz} (VERDICT #9 done criterion)."""
    mel_fe = VocoderMel(cfg)
    np_rng = np.random.default_rng(seed)
    wavs, f0s = synthetic_voice_batch(np_rng, n, seconds, cfg.sr)
    mels = mel_fe(jnp.asarray(wavs))
    pred = apply(params, cfg, mels)
    pred_mels = mel_fe(pred)
    mel_mse = float(jnp.mean((pred_mels - mels) ** 2))
    f0_err = [abs(estimate_f0(np.asarray(pred[i]), cfg.sr) - f0s[i]) for i in range(n)]
    return {"mel_mse": mel_mse, "f0_mae_hz": float(np.mean(f0_err))}


def envelope_correlation(params: dict, cfg: VocoderConfig, *, n: int = 6,
                         seconds: float = 0.6, seed: int = 321,
                         num_speakers: int = 8) -> float:
    """Spectral-envelope intelligibility proxy on HELD-OUT multi-speaker sentences:
    mean per-frame Pearson correlation between the target sentence's mel envelope
    and the resynthesized waveform's mel envelope. The formant trajectories ARE the
    'phonetic' content of the procedural corpus, so tracking them across frames is
    the closest no-ASR intelligibility measure available in-environment."""
    mel_fe = VocoderMel(cfg)
    rng = np.random.default_rng(seed)
    wavs = synthetic_speaker_batch(rng, rng.integers(0, num_speakers, n),
                                   seconds, cfg.sr)
    mels = mel_fe(jnp.asarray(wavs))
    pred_mels = mel_fe(apply(params, cfg, mels))
    a = np.asarray(mels)
    b = np.asarray(pred_mels)
    # per-frame correlation over the mel axis, averaged over frames & sentences
    a = a - a.mean(axis=-1, keepdims=True)
    b = b - b.mean(axis=-1, keepdims=True)
    num = (a * b).sum(-1)
    den = np.sqrt((a * a).sum(-1) * (b * b).sum(-1)) + 1e-9
    return float((num / den).mean())


_DEFAULT_VOCODER: "NeuralVocoder | None" = None


def default_vocoder(steps: int = 200) -> "NeuralVocoder":
    """Process-cached NeuralVocoder — the default voice-out path
    (runtime/voice.py); Griffin-Lim remains the zero-setup fallback.

    Loads the shipped pre-trained asset (assets/vocoder.safetensors, produced
    by scripts/train_vocoder_artifact.py with a 5-10x larger training budget)
    when present; otherwise the FIRST call in a process runs a `steps`-step
    training loop (the procedural corpus stands in for real weights in this
    environment) — tens of seconds of synchronous compile+train. Pass an
    explicit vocoder (GriffinLim or a pre-trained NeuralVocoder) to
    StreamingTTSSession to avoid it."""
    global _DEFAULT_VOCODER
    if _DEFAULT_VOCODER is None:
        import os
        import sys

        cfg = VocoderConfig()
        asset = os.path.join(os.path.dirname(__file__), "..", "assets",
                             "vocoder.safetensors")
        if os.path.exists(asset):
            from audio_flamingo_tpu.train.checkpoints import import_safetensors

            template = init(jax.random.PRNGKey(0), cfg)
            params = import_safetensors(asset, template)
        else:
            print(f"[audio_flamingo_tpu] training the default neural vocoder "
                  f"({steps} steps, first call only)...", file=sys.stderr,
                  flush=True)
            params, _ = train(jax.random.PRNGKey(0), cfg, steps=steps)
        _DEFAULT_VOCODER = NeuralVocoder(params, cfg)
    return _DEFAULT_VOCODER


# --------------------------------------------------------------------------------------
# Streaming synthesis + runtime adapter
# --------------------------------------------------------------------------------------


def stream_synthesize(params: dict, cfg: VocoderConfig, mel_chunks,
                      ctx_frames: int | None = None):
    """Generator over waveform chunks given an iterator of [frames, n_mels] chunks.

    The generator's convs are non-causal (SAME padding), so each emitted sample
    needs `ctx_frames` of mel context on BOTH sides: the stream holds back a
    ctx-frame lookahead (~ctx*hop/sr seconds of latency, 120-170 ms at defaults)
    and re-runs a ctx-frame left overlap.

    Legacy (non-harmonic) layout: every emitted sample equals the
    full-utterance pass exactly. Harmonic layout ('f0_head' in params): the
    sine source's frame-base phase is carried across chunks as a scalar
    (accumulated from the same per-frame F0 predictions), so the stream is
    phase-continuous; samples match the full pass to a small band rather than
    bit-exactly — the scalar accumulation reassociates float adds, and the F0
    head's +-4-frame receptive field sees window edges where the full pass
    sees real frames (tests/test_neural_vocoder.py gates the band)."""
    harmonic = "f0_head" in params
    ctx = (cfg.receptive_frames + (5 if harmonic else 0)
           if ctx_frames is None else ctx_frames)
    buf = None          # retained mel frames; buf[0] is absolute frame `base`
    base = 0
    emitted = 0         # absolute frames emitted so far
    phase0 = 0.0        # harmonic frame-base phase of frame `base`

    def synth(window):
        if not harmonic:
            return apply(params, cfg, window[None])[0]
        p0 = jnp.asarray([phase0], jnp.float32)
        return apply(params, cfg, window[None], phase0=p0)[0]

    for chunk in mel_chunks:
        chunk = jnp.asarray(chunk)
        buf = chunk if buf is None else jnp.concatenate([buf, chunk], axis=0)
        ready = base + buf.shape[0] - ctx      # frames with full right context
        if ready > emitted:
            lo = max(emitted - ctx, 0)
            window = buf[lo - base:]
            wav = synth(window)
            out = np.asarray(wav[(emitted - lo) * cfg.hop: (ready - lo) * cfg.hop])
            emitted = ready
            keep = max(emitted - ctx, 0)
            if harmonic and keep > base:
                f0_win, _ = predict_f0(params, cfg, window[None])
                drop = np.asarray(f0_win[0, : keep - lo], np.float64)
                phase0 = float(np.mod(
                    phase0 + 2.0 * np.pi * drop.sum() * cfg.hop / cfg.sr,
                    2.0 * np.pi))
            buf, base = buf[keep - base:], keep
            yield out
    if buf is not None and base + buf.shape[0] > emitted:
        lo = max(emitted - ctx, 0)
        window = buf[lo - base:]
        wav = synth(window)
        yield np.asarray(wav[(emitted - lo) * cfg.hop:])


class NeuralVocoder:
    """Drop-in alternative to audio.vocoder.GriffinLim for runtime/voice.py."""

    def __init__(self, params: dict, cfg: VocoderConfig = VocoderConfig()):
        self.params, self.cfg = params, cfg

    def mel_to_waveform(self, log_mel: jnp.ndarray, seed: int = 0) -> np.ndarray:
        return np.asarray(apply(self.params, self.cfg, jnp.asarray(log_mel)[None])[0])
