"""Interactive demo server: UI page, mic-PCM chat, WAV-file chat, reset."""

import base64
import json
import struct
import urllib.request

import numpy as np
import pytest

from audio_flamingo_tpu.api import AudioFlamingo
from audio_flamingo_tpu.serve.demo import DemoServer


def _wav_bytes(wav: np.ndarray, sr: int = 16_000) -> bytes:
    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE",
                      b"fmt ", 16, 1, 1, sr, sr * 2, 2, 16, b"data", len(pcm))
    return hdr + pcm


@pytest.fixture(scope="module")
def server():
    model = AudioFlamingo.from_random()
    srv = DemoServer(model, port=0, max_new_tokens=8)
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(srv, path, payload):
    req = urllib.request.Request(f"http://127.0.0.1:{srv.port}{path}",
                                 data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_index_page(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/", timeout=30) as r:
        body = r.read().decode()
    assert "Audio Flamingo" in body and "/api/chat" in body


def test_chat_with_mic_pcm(server):
    t = np.arange(16_000) / 16_000
    pcm = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    resp = _post(server, "/api/chat",
                 {"prompt": "What do you hear?",
                  "pcm_b64": base64.b64encode(pcm.tobytes()).decode()})
    assert isinstance(resp["text"], str)
    assert len(server.model.history) == 2          # user + assistant turns


def test_chat_with_wav_file_and_reset(server):
    t = np.arange(8000) / 16_000
    wav = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    resp = _post(server, "/api/chat",
                 {"prompt": "Describe.",
                  "file_b64": base64.b64encode(_wav_bytes(wav)).decode()})
    assert isinstance(resp["text"], str)
    assert _post(server, "/api/reset", {})["ok"]
    assert server.model.history == []


def test_text_only_chat(server):
    resp = _post(server, "/api/chat", {"prompt": "Hello there."})
    assert isinstance(resp["text"], str)


def test_bad_audio_reports_error(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(server, "/api/chat",
              {"prompt": "x", "file_b64": base64.b64encode(b"nope").decode()})
    assert exc.value.code == 400
    assert "error" in json.loads(exc.value.read())
