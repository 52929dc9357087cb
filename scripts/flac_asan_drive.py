import ctypes, os, sys
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from audio_flamingo_tpu.audio import flac_ref

lib = ctypes.CDLL(sys.argv[1] if len(sys.argv) > 1 else "/tmp/libflac_asan.so")
lib.af_decode_flac.restype = ctypes.c_int
lib.af_decode_flac.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
                               ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                               ctypes.POINTER(ctypes.c_uint64),
                               ctypes.POINTER(ctypes.c_int)]
lib.af_free.argtypes = [ctypes.c_void_p]

def decode(data: bytes):
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_uint64()
    sr = ctypes.c_int()
    rc = lib.af_decode_flac(buf, len(data), ctypes.byref(out), ctypes.byref(n),
                            ctypes.byref(sr))
    if rc == 0:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
        lib.af_free(out)
        return arr, sr.value
    return None, rc

rng = np.random.default_rng(0)
cases = []
for nsamp in (1, 100, 4095, 4096, 4097, 20000):
    wav = (0.5*np.sin(2*np.pi*440*np.arange(nsamp)/16000) + 0.01*rng.normal(size=nsamp)).astype(np.float32)
    cases.append(("tone%d" % nsamp, flac_ref.encode_flac(wav, 16000)))
# malformed inputs
good = cases[2][1]
cases += [("truncated", good[:len(good)//3]), ("corrupt", good[:40] + b"\xff"*40 + good[80:]),
          ("empty", b""), ("garbage", bytes(rng.integers(0, 256, 500, dtype=np.uint8)))]
for name, data in cases:
    arr, info = decode(data)
    if arr is not None:
        print(f"{name}: decoded {len(arr)} samples, finite={np.isfinite(arr).all()}", flush=True)
    else:
        print(f"{name}: rejected rc={info}", flush=True)
print("DRIVE DONE", flush=True)

# Usage:
#   g++ -shared -fPIC -fsanitize=address,undefined -g -O1 -o /tmp/libflac_asan.so \
#       audio_flamingo_tpu/audio/cpp/flac.cpp audio_flamingo_tpu/audio/cpp/audioio.cpp
#   LD_PRELOAD=$(gcc -print-file-name=libasan.so) ASAN_OPTIONS=detect_leaks=0 \
#       python scripts/flac_asan_drive.py /tmp/libflac_asan.so
