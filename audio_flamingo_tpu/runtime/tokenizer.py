"""Byte-level BPE tokenizer (Qwen2/GPT-2 family), framework-native.

Replaces the HF `tokenizers` Rust BPE (SURVEY.md §2.10). Algorithm reference:
[hf] models/qwen2/tokenization_qwen2.py (pretokenize regex :39, bytes_to_unicode :44-67,
bpe merge loop :208-240). A C++ fast path (runtime/cpp/bpe.cpp, ctypes-bound) accelerates
encode when built; this Python implementation is the always-available reference.

Vocab formats: vocab.json + merges.txt, or a combined tokenizer.json (HF format).
"""

from __future__ import annotations

import functools
import json
import os
import unicodedata
from typing import Iterable

try:
    import regex as _re
except ImportError:  # pragma: no cover
    import re as _re

PRETOKENIZE_REGEX = (
    r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}|"""
    r""" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""
)

# AF-specific special tokens (audio placeholder per SURVEY.md §2.4; Qwen2 chat markers)
DEFAULT_SPECIAL_TOKENS = ("<|endoftext|>", "<|im_start|>", "<|im_end|>", "<sound>",
                          "<|audio_bos|>", "<|audio_eos|>")


@functools.lru_cache
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2 reversible byte<->unicode table ([hf] tokenization_qwen2.py:44-67)."""
    bs = (list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


class _NativeBpe:
    """ctypes binding to runtime/cpp/bpe.cpp (the BPE merge hot loop in C++)."""

    _lib = None
    _lib_tried = False

    def __init__(self, handle, lib):
        self._handle = handle
        self._lib = lib
        import ctypes

        self._buf = (ctypes.c_int32 * 4096)()

    @classmethod
    def _load_lib(cls):
        if cls._lib_tried:
            return cls._lib
        cls._lib_tried = True
        import ctypes
        import os
        import subprocess

        d = os.path.join(os.path.dirname(__file__), "cpp")
        so = os.path.join(d, "libbpe.so")
        if not os.path.exists(so):
            try:
                subprocess.run(["g++", "-O3", "-shared", "-fPIC",
                                os.path.join(d, "bpe.cpp"), "-o", so],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        lib = ctypes.CDLL(so)
        lib.af_bpe_new.restype = ctypes.c_void_p
        lib.af_bpe_new.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p,
                                   ctypes.c_uint64]
        lib.af_bpe_encode.restype = ctypes.c_int64
        lib.af_bpe_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
                                      ctypes.POINTER(ctypes.c_int32), ctypes.c_uint64]
        lib.af_bpe_free.argtypes = [ctypes.c_void_p]
        cls._lib = lib
        return lib

    @classmethod
    def create(cls, vocab: dict[str, int], merges: list[tuple[str, str]]):
        lib = cls._load_lib()
        if lib is None:
            return None
        # ids must be dense 0..N-1 for the line-index vocab format
        inv = sorted(vocab.items(), key=lambda kv: kv[1])
        if [i for _, i in inv] != list(range(len(inv))):
            return None
        vocab_blob = "\n".join(k for k, _ in inv).encode("utf-8")
        merges_blob = "\n".join(f"{a} {b}" for a, b in merges).encode("utf-8")
        handle = lib.af_bpe_new(vocab_blob, len(vocab_blob), merges_blob, len(merges_blob))
        return cls(handle, lib) if handle else None

    def encode(self, pretoken: str) -> list[int] | None:
        data = pretoken.encode("utf-8")
        n = self._lib.af_bpe_encode(self._handle, data, len(data), self._buf, 4096)
        if n < 0:
            return None
        return list(self._buf[:n])

    def __del__(self):
        try:
            self._lib.af_bpe_free(self._handle)
        except Exception:
            pass


class BBPETokenizer:
    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 special_tokens: Iterable[str] = DEFAULT_SPECIAL_TOKENS,
                 use_native: bool = True):
        self.vocab = dict(vocab)
        self.inv_vocab = {v: k for k, v in self.vocab.items()}
        self.merges = [tuple(m) for m in merges]
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.pat = _re.compile(PRETOKENIZE_REGEX)
        self.special_tokens: dict[str, int] = {}
        for tok in special_tokens:
            if tok in self.vocab:
                self.special_tokens[tok] = self.vocab[tok]
        self._special_pat = None
        if self.special_tokens:
            self._special_pat = _re.compile(
                "(" + "|".join(_re.escape(t) for t in sorted(self.special_tokens,
                                                             key=len, reverse=True)) + ")")
        self._bpe_cache: dict[str, list[str]] = {}
        self._native = None
        if use_native:
            self._native = _NativeBpe.create(self.vocab, self.merges)

    # ---------------------------------------------------------------- construction
    @classmethod
    def from_files(cls, vocab_file: str, merges_file: str, **kw) -> "BBPETokenizer":
        with open(vocab_file, encoding="utf-8") as f:
            vocab = json.load(f)
        merges = []
        with open(merges_file, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split()
                merges.append((a, b))
        return cls(vocab, merges, **kw)

    @classmethod
    def from_tokenizer_json(cls, path: str, **kw) -> "BBPETokenizer":
        with open(path, encoding="utf-8") as f:
            tj = json.load(f)
        model = tj["model"]
        vocab = dict(model["vocab"])
        merges = [tuple(m.split(" ") if isinstance(m, str) else m) for m in model["merges"]]
        added = [t["content"] for t in tj.get("added_tokens", [])]
        for t in tj.get("added_tokens", []):
            vocab.setdefault(t["content"], t["id"])
        specials = list(dict.fromkeys(list(kw.pop("special_tokens", ())) + added
                                      + list(DEFAULT_SPECIAL_TOKENS)))
        return cls(vocab, merges, special_tokens=specials, **kw)

    @classmethod
    def from_pretrained_dir(cls, path: str, **kw) -> "BBPETokenizer":
        tj = os.path.join(path, "tokenizer.json")
        if os.path.exists(tj):
            return cls.from_tokenizer_json(tj, **kw)
        return cls.from_files(os.path.join(path, "vocab.json"),
                              os.path.join(path, "merges.txt"), **kw)

    # ---------------------------------------------------------------------- encode
    def _bpe(self, token: str) -> list[str]:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        self._bpe_cache[token] = word
        return word

    def _encode_ordinary(self, text: str) -> list[int]:
        ids = []
        native = self._native
        for tok in self.pat.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            if native is not None:
                got = native.encode(mapped)
                if got is not None:
                    ids.extend(got)
                    continue
            for piece in self._bpe(mapped):
                ids.append(self.vocab[piece])
        return ids

    def encode(self, text: str, allow_special: bool = True) -> list[int]:
        # Qwen2 normalizes to NFC before tokenizing ([hf] tokenization_qwen2.py
        # prepare_for_tokenization) — e.g. compatibility ideograph U+FA70 並 encodes as
        # its canonical form U+4E26. Decode therefore inverts up to NFC.
        text = unicodedata.normalize("NFC", text)
        if not allow_special or self._special_pat is None:
            return self._encode_ordinary(text)
        ids: list[int] = []
        for part in self._special_pat.split(text):
            if not part:
                continue
            if part in self.special_tokens:
                ids.append(self.special_tokens[part])
            else:
                ids.extend(self._encode_ordinary(part))
        return ids

    # ---------------------------------------------------------------------- decode
    def decode(self, ids: Iterable[int], skip_special: bool = False) -> str:
        special_ids = set(self.special_tokens.values())
        out = []
        buf = []  # byte-level pieces
        for i in ids:
            i = int(i)
            tok = self.inv_vocab.get(i)
            if tok is None:
                continue
            if i in special_ids:
                if buf:
                    out.append(self._decode_pieces(buf))
                    buf = []
                if not skip_special:
                    out.append(tok)
            else:
                buf.append(tok)
        if buf:
            out.append(self._decode_pieces(buf))
        return "".join(out)

    def _decode_pieces(self, pieces: list[str]) -> str:
        data = bytes(self.byte_decoder[c] for c in "".join(pieces))
        return data.decode("utf-8", errors="replace")

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)


def train_bpe(texts: Iterable[str], vocab_size: int,
              special_tokens: Iterable[str] = DEFAULT_SPECIAL_TOKENS):
    """Tiny BPE trainer (tests/tooling; not a production trainer): returns (vocab, merges)."""
    be = bytes_to_unicode()
    pat = _re.compile(PRETOKENIZE_REGEX)
    words: dict[tuple[str, ...], int] = {}
    for text in texts:
        for tok in pat.findall(text):
            mapped = tuple(be[b] for b in tok.encode("utf-8"))
            words[mapped] = words.get(mapped, 0) + 1
    vocab_set = sorted(be.values())
    vocab = {s: i for i, s in enumerate(vocab_set)}
    merges: list[tuple[str, str]] = []
    while len(vocab) + len(tuple(special_tokens)) < vocab_size:
        pair_counts: dict[tuple[str, str], int] = {}
        for w, c in words.items():
            for i in range(len(w) - 1):
                pair_counts[(w[i], w[i + 1])] = pair_counts.get((w[i], w[i + 1]), 0) + c
        if not pair_counts:
            break
        best = max(pair_counts, key=lambda p: (pair_counts[p], p))
        merges.append(best)
        vocab["".join(best)] = len(vocab)
        new_words = {}
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    for t in special_tokens:
        vocab[t] = len(vocab)
    return vocab, merges
