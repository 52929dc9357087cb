"""Golden test: byte-level BPE vs the [hf] slow Qwen2Tokenizer on a synthetic vocab,
plus processor placeholder-expansion tests."""

import json

import numpy as np
import pytest

from audio_flamingo_tpu.runtime.tokenizer import BBPETokenizer, train_bpe

CORPUS = [
    "What sounds do you hear in this clip?",
    "The audio contains a dog barking, followed by loud music and speech.",
    "Describe the melody, tempo, and instruments of the song.",
    "A 440 Hz sine tone plays for 7 seconds. Hello world! 12345",
    "Transcribe the speech: 'the quick brown fox jumps over the lazy dog'.",
]


@pytest.fixture(scope="module")
def tok_files(tmp_path_factory):
    vocab, merges = train_bpe(CORPUS, vocab_size=400)
    d = tmp_path_factory.mktemp("tok")
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return d


def test_encode_decode_roundtrip(tok_files):
    tok = BBPETokenizer.from_files(str(tok_files / "vocab.json"), str(tok_files / "merges.txt"))
    for text in CORPUS + ["unseen wörds with ünïcode — and emoji 🎵!"]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text


def test_matches_hf_qwen2_tokenizer(tok_files):
    from transformers.models.qwen2.tokenization_qwen2 import Qwen2Tokenizer

    hf = Qwen2Tokenizer(str(tok_files / "vocab.json"), str(tok_files / "merges.txt"),
                        unk_token=None, bos_token=None, eos_token="<|endoftext|>")
    ours = BBPETokenizer.from_files(str(tok_files / "vocab.json"), str(tok_files / "merges.txt"))
    for text in CORPUS + ["  leading spaces", "tabs\tand\nnewlines \n\n end", "ALL CAPS 99"]:
        ref = hf(text, add_special_tokens=False)["input_ids"]
        got = ours.encode(text, allow_special=False)
        assert got == ref, (text, got, ref)


def test_special_tokens_atomic(tok_files):
    tok = BBPETokenizer.from_files(str(tok_files / "vocab.json"), str(tok_files / "merges.txt"))
    text = "<|im_start|>user\nWhat is<sound>this?<|im_end|>"
    ids = tok.encode(text)
    assert tok.special_tokens["<sound>"] in ids
    assert tok.special_tokens["<|im_start|>"] == ids[0]
    assert tok.decode(ids) == text
    assert "<sound>" not in tok.decode(ids, skip_special=True)


def test_processor_expansion(tok_files):
    from audio_flamingo_tpu.config import AF3Config
    from audio_flamingo_tpu.runtime.processor import AF3Processor, AUDIO_TOKEN

    cfg = AF3Config.tiny()
    tok = BBPETokenizer.from_files(str(tok_files / "vocab.json"), str(tok_files / "merges.txt"))
    proc = AF3Processor(tokenizer=tok, cfg=cfg)
    # override audio token id to the synthetic vocab's
    audio_id = tok.special_tokens[AUDIO_TOKEN]

    wav = np.zeros(16000 * 3, np.float32)  # 3 s -> 1 window bucket
    out = proc(text=f"Describe {AUDIO_TOKEN} please.", audios=[wav])
    ids, mels = out["ids"], out["mels"]
    tpw = cfg.encoder.max_source_positions // cfg.encoder.pool_stride
    assert (ids == audio_id).sum() == tpw  # 1 window * 750
    assert mels.shape == (1, 1, 3000, cfg.encoder.num_mel_bins)

    # 65 s clip -> bucket 4 windows
    wav_long = np.zeros(16000 * 65, np.float32)
    out2 = proc(text=f"{AUDIO_TOKEN}", audios=[wav_long])
    assert out2["mels"].shape[1] == 4
    assert (out2["ids"] == audio_id).sum() == 4 * tpw


def test_processor_chat_template(tok_files):
    from audio_flamingo_tpu.config import AF3Config
    from audio_flamingo_tpu.runtime.processor import AF3Processor

    tok = BBPETokenizer.from_files(str(tok_files / "vocab.json"), str(tok_files / "merges.txt"))
    proc = AF3Processor(tokenizer=tok, cfg=AF3Config.tiny())
    text = proc.apply_chat_template([
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "again"},
    ])
    assert text.startswith("<|im_start|>system\n")
    assert text.endswith("<|im_start|>assistant\n")
    assert text.count("<|im_start|>") == 5  # system + 3 turns + generation prompt


def test_native_bpe_matches_python(tok_files):
    """The C++ merge engine must produce identical ids to the Python reference."""
    nat = BBPETokenizer.from_files(str(tok_files / "vocab.json"),
                                   str(tok_files / "merges.txt"), use_native=True)
    py = BBPETokenizer.from_files(str(tok_files / "vocab.json"),
                                  str(tok_files / "merges.txt"), use_native=False)
    if nat._native is None:
        import pytest as _pytest

        _pytest.skip("native bpe unavailable")
    for text in CORPUS + ["ünïcode — emoji 🎵!", "  spaces\tand\nnewlines", "CAPS 123"]:
        assert nat.encode(text) == py.encode(text), text


def test_fuzz_tokenizer_matches_hf(tok_files):
    """Property test: random unicode strings tokenize identically to the HF reference."""
    from hypothesis import given, settings, strategies as st
    from transformers.models.qwen2.tokenization_qwen2 import Qwen2Tokenizer

    hf = Qwen2Tokenizer(str(tok_files / "vocab.json"), str(tok_files / "merges.txt"),
                        unk_token=None, bos_token=None, eos_token="<|endoftext|>")
    ours = BBPETokenizer.from_files(str(tok_files / "vocab.json"),
                                    str(tok_files / "merges.txt"))

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=60))
    def check(text):
        assert ours.encode(text, allow_special=False) == \
            hf(text, add_special_tokens=False)["input_ids"]
        # decode is a perfect inverse up to NFC (encode normalizes like HF Qwen2 does)
        import unicodedata

        assert ours.decode(ours.encode(text, allow_special=False)) == \
            unicodedata.normalize("NFC", text)

    check()


def test_nfc_normalization_matches_hf(tok_files):
    """Compatibility ideographs NFC-fold before BPE, exactly like Qwen2Tokenizer."""
    from transformers.models.qwen2.tokenization_qwen2 import Qwen2Tokenizer

    hf = Qwen2Tokenizer(str(tok_files / "vocab.json"), str(tok_files / "merges.txt"),
                        unk_token=None, bos_token=None, eos_token="<|endoftext|>")
    ours = BBPETokenizer.from_files(str(tok_files / "vocab.json"),
                                    str(tok_files / "merges.txt"))
    for text in ["並", "café", "並 mixed café"]:  # 並, café NFD
        assert ours.encode(text, allow_special=False) == \
            hf(text, add_special_tokens=False)["input_ids"], text
