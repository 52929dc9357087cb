"""Phase-by-phase profile of the AF2 device-resident frontend (VERDICT r4 #3):
where do the milliseconds go — tunnel upload, tiling gather, mel compute, or
the old host path's downloads? Run on the TPU: python scripts/profile_af2_frontend.py"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def t(fn, reps=3, warm=1):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax

    from audio_flamingo_tpu.config import AF2Config
    from audio_flamingo_tpu.runtime.clap_processor import AF2Processor

    proc = AF2Processor(tokenizer=None, cfg=AF2Config())
    fe = proc.frontend
    max_s = fe.max_samples
    n = 30
    wav = (np.random.default_rng(0).normal(size=48_000 * 300) * 0.1
           ).astype(np.float32)
    wav_padded = np.pad(wav, (0, n * max_s - len(wav)))

    # 1. pure upload (57.6 MB f32) + sync
    def upload():
        d = jax.device_put(wav_padded)
        _ = float(d[0])
        return d

    print(f"upload 57.6MB f32: {t(upload)*1e3:.0f} ms", flush=True)
    wav_dev = upload()

    # 2. device-resident window split + mel on the resident wav (the shipped
    #    path: window_chunks_device eager tiling + jitted _db_mel)
    def dev_chain():
        chunks_d = fe.window_chunks_device(wav_dev, n, fe.cfg.padding)
        m = fe._db_mel(chunks_d, fe.num_frames_max,
                       fe.cfg.truncation == "fusion")
        _ = float(m[0, 0, 0])

    print(f"window_chunks_device + _db_mel (resident wav): "
          f"{t(dev_chain)*1e3:.0f} ms", flush=True)

    # 2b. the full shipped surface end-to-end (upload included)
    def e2e():
        mels, _ = proc.windows_for_device(wav)
        _ = float(mels[0, 0, 0, 0])

    print(f"windows_for_device e2e (f32 upload): {t(e2e)*1e3:.0f} ms",
          flush=True)

    # 3. _db_mel alone on resident pre-chunked [30, 480000]
    chunks = jax.device_put(wav_padded.reshape(n, max_s))
    _ = float(chunks[0, 0])

    def db_mel():
        m = fe._db_mel(chunks, fe.num_frames_max, True)
        _ = float(m[0, 0, 0])

    print(f"_db_mel alone (resident chunks): {t(db_mel)*1e3:.0f} ms", flush=True)

    # 4. old host path for reference
    def host_path():
        m, _lg = proc.windows_for(wav)
        return m

    print(f"host windows_for: {t(host_path)*1e3:.0f} ms", flush=True)

    # 5. int16 upload alternative (28.8 MB) + device dequant
    wav16 = (np.clip(wav_padded, -1, 1) * 32767).astype(np.int16)

    def upload16():
        d = jax.device_put(wav16)
        _ = int(d[0])
        return d

    print(f"upload 28.8MB int16: {t(upload16)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
