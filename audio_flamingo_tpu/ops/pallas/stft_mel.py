"""Fused Pallas log-mel frontend: framing + windowed rDFT + power + mel + log10,
tiled over frames; per-window max-8 clamp fused as a second tiny kernel.

Replaces cuFFT + host DSP (SURVEY.md §2.10 row 1). The STFT rides the MXU as a matmul
against a windowed DFT basis; framing uses three sample-shifted row views of the padded
signal (hop=160: frame f = rows0[f] | rows1[f] | rows2[f][:80]), so every VMEM load is a
unit-stride, sublane-aligned block — no gather and no 96 MB frame tensor in HBM. Each grid
step streams only the rows it needs (BlockSpec pipelining).

Numerics must match audio/mel.py `_window_mels` (golden-tested vs HF); the DFT matmul runs
in f32 with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Pallas compiled mode needs a TPU; interpret transparently on CPU (tests/fallback)."""
    import jax

    return jax.default_backend() == "cpu"



def _logmel_kernel(r0_ref, r1_ref, r2_ref, basis_ref, mel_w_ref, out_ref, *, n_fft: int,
                   n_bins: int):
    """Grid: (num_windows, frames_per_window // frames_per_step).

    r{0,1,2}_ref: [1, fs, hop] row views shifted by 0/1/2 rows; frame f is their concat
    truncated to n_fft. basis_ref: [n_fft, 2*nb_pad] = [cos | sin] windowed DFT basis.
    """
    hi = jax.lax.Precision.HIGHEST  # full f32 MXU passes; bf16 costs ~0.4 abs error here
    frames = jnp.concatenate([r0_ref[0], r1_ref[0], r2_ref[0]], axis=-1)[:, :n_fft]
    spec = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32, precision=hi)
    nb_pad = basis_ref.shape[-1] // 2
    re = spec[:, :nb_pad]
    im = spec[:, nb_pad:]
    power = re * re + im * im
    mel = jnp.dot(power, mel_w_ref[:], preferred_element_type=jnp.float32, precision=hi)
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


def _clamp_kernel(logmel_ref, out_ref):
    """Per-window clamp at max-8 and (x+4)/4 scaling; grid: (num_windows,)."""
    x = logmel_ref[0]
    x = jnp.maximum(x, jnp.max(x) - 8.0)
    out_ref[0] = (x + 4.0) / 4.0


@functools.partial(jax.jit, static_argnames=("hop", "frames_per_window"))
def fused_log_mel(wins: jnp.ndarray, dft_cos: jnp.ndarray, dft_sin: jnp.ndarray,
                  mel_weights: jnp.ndarray, hop: int, frames_per_window: int) -> jnp.ndarray:
    """[N, window_samples] f32 -> [N, frames_per_window, n_mels] f32.

    Matches audio/mel.WhisperMelFrontend._window_mels (reflect-padded centered frames,
    per-window normalization).
    """
    n, total = wins.shape
    n_fft, n_bins = dft_cos.shape
    n_mels = mel_weights.shape[1]
    half = n_fft // 2
    fs = 200  # frames per grid step: multiple of the f32 sublane tile (8)
    assert frames_per_window % fs == 0

    padded = jnp.pad(wins, ((0, 0), (half, half)), mode="reflect")
    rows = frames_per_window  # row r <-> frame r start
    need = rows * hop + 2 * hop + max(0, n_fft - 2 * hop)
    padded = jnp.pad(padded, ((0, 0), (0, max(0, need - padded.shape[1]))))
    views = [padded[:, off: off + rows * hop].reshape(n, rows, hop) for off in
             (0, hop, 2 * hop)]

    nb_pad = -(-n_bins // 128) * 128
    basis = jnp.zeros((n_fft, 2 * nb_pad), jnp.float32)
    basis = basis.at[:, :n_bins].set(dft_cos).at[:, nb_pad: nb_pad + n_bins].set(dft_sin)
    mel_w = jnp.zeros((nb_pad, n_mels), jnp.float32).at[:n_bins].set(mel_weights)

    row_spec = pl.BlockSpec((1, fs, hop), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    logmel = pl.pallas_call(
        functools.partial(_logmel_kernel, n_fft=n_fft, n_bins=n_bins),
        grid=(n, frames_per_window // fs),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec((n_fft, 2 * nb_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_pad, n_mels), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, fs, n_mels), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, frames_per_window, n_mels), jnp.float32),
        interpret=_interpret(),
    )(views[0], views[1], views[2], basis, mel_w)

    return pl.pallas_call(
        _clamp_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, frames_per_window, n_mels), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, frames_per_window, n_mels), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, frames_per_window, n_mels), jnp.float32),
        interpret=_interpret(),
    )(logmel)
