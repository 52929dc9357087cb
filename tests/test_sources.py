"""Dataset source tests: JSONL manifests and tar shards feed the batch builder."""

import io
import json
import tarfile
import wave

import numpy as np
import pytest


def _wav_bytes(seconds=1, sr=16_000):
    buf = io.BytesIO()
    x = (np.sin(2 * np.pi * 440 * np.arange(sr * seconds) / sr) * 0.3 * 32767).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_jsonl_source(tmp_path):
    from audio_flamingo_tpu.train.sources import JsonlSource

    (tmp_path / "a.wav").write_bytes(_wav_bytes())
    manifest = tmp_path / "data.jsonl"
    rows = [
        {"audio": "a.wav", "prompt": "What is this?", "answer": "a tone"},
        {"prompt": "Text only?", "answer": "yes"},
    ]
    manifest.write_text("\n".join(json.dumps(r) for r in rows))
    src = JsonlSource(str(manifest), audio_root=str(tmp_path)).source()
    rng = np.random.default_rng(0)
    seen_audio = seen_text_only = False
    for _ in range(10):
        audios, prompt, answer = src.examples(rng)
        if audios:
            assert audios[0].dtype == np.float32 and len(audios[0]) == 16_000
            assert "<sound>" in prompt
            seen_audio = True
        else:
            seen_text_only = True
    assert seen_audio and seen_text_only


def test_tar_shard_source(tmp_path):
    from audio_flamingo_tpu.train.sources import TarShardSource

    shard = tmp_path / "shard-000.tar"
    with tarfile.open(shard, "w") as tf:
        for key in ("000001", "000002"):
            wb = _wav_bytes()
            info = tarfile.TarInfo(f"{key}.wav")
            info.size = len(wb)
            tf.addfile(info, io.BytesIO(wb))
            meta = json.dumps({"prompt": "Describe", "answer": f"clip {key}"}).encode()
            info = tarfile.TarInfo(f"{key}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))
    src = TarShardSource([str(shard)]).source()
    rng = np.random.default_rng(1)
    audios, prompt, answer = src.examples(rng)
    assert len(audios) == 1 and audios[0].dtype == np.float32
    assert prompt.startswith("<sound>")
    assert answer.startswith("clip ")


def test_sources_feed_batch_builder(tmp_path):
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import dataclasses

    from audio_flamingo_tpu.config import AF3Config
    from audio_flamingo_tpu.runtime.processor import AF3Processor, AUDIO_TOKEN
    from audio_flamingo_tpu.runtime.tokenizer import BBPETokenizer, train_bpe
    from audio_flamingo_tpu.train.data import BatchBuilder, MixtureSampler, batches
    from audio_flamingo_tpu.train.sources import JsonlSource

    (tmp_path / "a.wav").write_bytes(_wav_bytes())
    manifest = tmp_path / "m.jsonl"
    manifest.write_text(json.dumps({"audio": "a.wav", "prompt": "What?", "answer": "tone"}))

    vocab, merges = train_bpe(["what tone"], 300)
    tok = BBPETokenizer(vocab, merges)
    cfg = AF3Config.tiny()
    cfg = dataclasses.replace(cfg, audio_token_id=tok.special_tokens[AUDIO_TOKEN])
    proc = AF3Processor(tokenizer=tok, cfg=cfg)
    sampler = MixtureSampler([JsonlSource(str(manifest), str(tmp_path)).source()], seed=0)
    batch = next(batches(sampler, BatchBuilder(processor=proc), batch_size=2))
    assert batch["ids"].shape[0] == 2
    assert (batch["ids"] == cfg.audio_token_id).sum() > 0
