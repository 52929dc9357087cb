"""Slot-based continuous-batching serving engine.

Production serving layer for the AF3 family (goes beyond the reference's single-request
scripts): B cache slots share one static KV buffer; requests prefill into free slots as
they arrive and decode advances ALL active slots together in chunks of K steps per device
dispatch (one host sync per chunk — on this machine a sync costs ~40 ms, so K amortizes
it; on local-PJRT deployments K can be 1 for lowest latency).

Static shapes throughout: per-row cache indices (`lengths`) replace the single-offset
StaticCache so rows at different positions coexist; per-row writes are vmapped
dynamic_update_slice. Numerics: engine greedy output == single-request generate.
"""

from __future__ import annotations

import functools
from collections import deque
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.models import qwen2
from audio_flamingo_tpu.ops import rms_norm, rope_cos_sin
from audio_flamingo_tpu.ops.sampling import SamplingParams, sample_token


class SlotCache(NamedTuple):
    k: jnp.ndarray        # [L, B, C, nkv, hd]
    v: jnp.ndarray
    lengths: jnp.ndarray  # [B] int32 filled length per row


def init_slot_cache(cfg, batch: int, capacity: int, dtype=jnp.bfloat16) -> SlotCache:
    hd = cfg.resolved_head_dim()
    shape = (cfg.num_layers, batch, capacity, cfg.num_kv_heads, hd)
    return SlotCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                     jnp.zeros((batch,), jnp.int32))


def _rows_forward(params, cfg, embeds, positions, cache: SlotCache):
    """Decode forward with PER-ROW cache offsets. embeds [B,1,d], positions [B]."""
    b = embeds.shape[0]
    hd = cfg.resolved_head_dim()
    cos, sin = rope_cos_sin(positions[:, None], hd, cfg.rope_theta)

    kv_pos = jnp.arange(cache.k.shape[2])[None, None, None, :]
    mask = kv_pos <= positions[:, None, None, None]

    def write_rows(c, kk, idx):
        return jax.vmap(lambda cr, kr, i: jax.lax.dynamic_update_slice(cr, kr, (i, 0, 0))
                        )(c, kk, idx)

    x = embeds

    def body(carry, xs):
        h = carry
        lp, ck, cv = xs
        hn = rms_norm(h, lp["ln1_w"], cfg.rms_norm_eps)
        q = qwen2._linear(hn, lp["q"]).reshape(b, 1, cfg.num_heads, hd)
        k = qwen2._linear(hn, lp["k"]).reshape(b, 1, cfg.num_kv_heads, hd)
        v = qwen2._linear(hn, lp["v"]).reshape(b, 1, cfg.num_kv_heads, hd)
        from audio_flamingo_tpu.ops import apply_rope, gqa_attention

        q, k = apply_rope(q, k, cos, sin)
        ck = write_rows(ck, k.astype(ck.dtype), positions)
        cv = write_rows(cv, v.astype(cv.dtype), positions)
        attn = gqa_attention(q, ck.astype(q.dtype), cv.astype(q.dtype), mask=mask)
        h = h + qwen2._linear(attn.reshape(b, 1, cfg.num_heads * hd), lp["o"])
        hn = rms_norm(h, lp["ln2_w"], cfg.rms_norm_eps)
        mlp = lp["mlp"]
        if isinstance(mlp["gate"], dict):
            from audio_flamingo_tpu.ops.quant import q_matmul

            act = jax.nn.silu(q_matmul(hn, mlp["gate"])) * q_matmul(hn, mlp["up"])
            h = h + q_matmul(act, mlp["down"])
        else:
            from audio_flamingo_tpu.ops import swiglu_mlp

            h = h + swiglu_mlp(hn, {k2: w.astype(h.dtype) for k2, w in mlp.items()})
        return h, (ck, cv)

    x, (nk, nv) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    x = rms_norm(x, params["ln_f_w"], cfg.rms_norm_eps)
    return x, SlotCache(nk, nv, cache.lengths)


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "sampling", "eos_token_id",
                                             "compute_dtype"),
                   donate_argnames=("cache",))
def decode_chunk(params, cfg: AF3Config, cache: SlotCache, tokens, done, rng,
                 *, chunk: int, sampling: SamplingParams, eos_token_id: int,
                 compute_dtype=jnp.bfloat16):
    """Advance all slots `chunk` steps. Returns (cache, tokens, done, rng, out [B, chunk])."""
    b = tokens.shape[0]
    out0 = jnp.full((b, chunk), eos_token_id, jnp.int32)

    def body(i, carry):
        cache, tok, done, rng, out = carry
        x = qwen2.embed(params["lm"], tok[:, None], dtype=compute_dtype)
        h, cache2 = _rows_forward(params["lm"], cfg.lm, x, cache.lengths, cache)
        logits = qwen2.unembed(params["lm"], cfg.lm, h[:, 0])
        rng, k = jax.random.split(rng)
        nxt = sample_token(k, logits, sampling)
        nxt = jnp.where(done, eos_token_id, nxt)
        new_lengths = cache.lengths + jnp.where(done, 0, 1)
        cache2 = SlotCache(cache2.k, cache2.v, new_lengths)
        out = out.at[:, i].set(nxt)
        done = jnp.logical_or(done, nxt == eos_token_id)
        return cache2, nxt, done, rng, out

    cache, tokens, done, rng, out = jax.lax.fori_loop(
        0, chunk, body, (cache, tokens, done, rng, out0))
    return cache, tokens, done, rng, out


@functools.partial(jax.jit, static_argnames=("cfg", "slot_capacity", "compute_dtype"),
                   donate_argnames=("cache",))
def prefill_into_slot(params, cfg: AF3Config, cache: SlotCache, slot, token_ids, mels,
                      *, slot_capacity: int, compute_dtype=jnp.bfloat16,
                      prompt_len: jnp.ndarray | None = None):
    """Prefill ONE request (batch 1) and install its KV into `slot`.

    Returns (cache, first-token logits [vocab]). token_ids may be right-padded to a
    shape bucket with `prompt_len` the true length (compile-count control).
    """
    t = token_ids.shape[1]
    sub_cache, logits = __import__("audio_flamingo_tpu.runtime.generate",
                                   fromlist=["prefill"]).prefill(
        params, cfg, token_ids, mels, slot_capacity, compute_dtype,
        prompt_len=prompt_len)
    # install: rows [L, 1, C, nkv, hd] -> cache[:, slot]
    k = jax.lax.dynamic_update_slice(
        cache.k, sub_cache.k.astype(cache.k.dtype), (0, slot, 0, 0, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, sub_cache.v.astype(cache.v.dtype), (0, slot, 0, 0, 0))
    lengths = cache.lengths.at[slot].set(
        t if prompt_len is None else prompt_len.astype(jnp.int32))
    return SlotCache(k, v, lengths), logits[0]


@dataclass
class Request:
    request_id: str
    ids: np.ndarray                   # [1, T]
    mels: np.ndarray | None = None
    max_new_tokens: int = 128
    tokens: list = field(default_factory=list)
    done: bool = False


@dataclass
class BatchEngine:
    """Host-side scheduler over the jitted prefill/decode-chunk pair."""

    params: dict
    cfg: AF3Config
    num_slots: int = 4
    capacity: int = 2048
    chunk: int = 16
    eos_token_id: int = -1
    sampling: SamplingParams = SamplingParams()
    compute_dtype: object = jnp.bfloat16
    seed: int = 0

    def __post_init__(self):
        self.cache = init_slot_cache(self.cfg.lm, self.num_slots, self.capacity,
                                     self.compute_dtype)
        self.tokens = jnp.full((self.num_slots,), self.eos_token_id, jnp.int32)
        self.done = jnp.ones((self.num_slots,), bool)
        self.rng = jax.random.PRNGKey(self.seed)
        self.queue: deque[Request] = deque()
        self.active: dict[int, Request] = {}
        self.finished: dict[str, list[int]] = {}

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def _fill_slots(self) -> None:
        for slot in range(self.num_slots):
            if slot in self.active or not self.queue:
                continue
            req = self.queue.popleft()
            mels = jnp.asarray(req.mels) if req.mels is not None else None
            from audio_flamingo_tpu.train.data import bucket_tokens

            ids = jnp.asarray(req.ids)
            t = ids.shape[1]
            bucket = min(bucket_tokens(t), self.capacity)
            prompt_len = None
            if bucket != t:
                ids = jnp.concatenate(
                    [ids, jnp.full((1, bucket - t), self.eos_token_id, jnp.int32)],
                    axis=1)
                prompt_len = jnp.asarray(t, jnp.int32)
            self.cache, logits = prefill_into_slot(
                self.params, self.cfg, self.cache, slot, ids, mels,
                slot_capacity=self.capacity, compute_dtype=self.compute_dtype,
                prompt_len=prompt_len)
            self.rng, k = jax.random.split(self.rng)
            first = sample_token(k, logits[None], self.sampling)[0]
            req.tokens.append(int(first))
            if int(first) == self.eos_token_id:
                self.finished[req.request_id] = req.tokens
                self.cache = self.cache._replace(
                    lengths=self.cache.lengths.at[slot].set(0))
                continue
            self.tokens = self.tokens.at[slot].set(first)
            self.done = self.done.at[slot].set(False)
            self.active[slot] = req

    def step(self) -> None:
        """One scheduling round: admit queued requests, decode one chunk."""
        self._fill_slots()
        if not self.active:
            return
        self.cache, self.tokens, self.done, self.rng, out = decode_chunk(
            self.params, self.cfg, self.cache, self.tokens, self.done, self.rng,
            chunk=self.chunk, sampling=self.sampling, eos_token_id=self.eos_token_id,
            compute_dtype=self.compute_dtype)
        out = np.asarray(out)
        done = np.asarray(self.done)
        lengths = np.asarray(self.cache.lengths)
        for slot, req in list(self.active.items()):
            budget = req.max_new_tokens - len(req.tokens)
            emitted = [int(t) for t in out[slot][:budget]]
            if self.eos_token_id in emitted:
                emitted = emitted[: emitted.index(self.eos_token_id) + 1]
            req.tokens.extend(emitted)
            # capacity guard: evict before per-row writes would clamp at the last slot
            if lengths[slot] >= self.capacity - self.chunk - 1:
                done[slot] = True
            if done[slot] or len(req.tokens) >= req.max_new_tokens:
                req.done = True
                self.finished[req.request_id] = req.tokens
                del self.active[slot]
                self.done = self.done.at[slot].set(True)
                self.cache = self.cache._replace(
                    lengths=self.cache.lengths.at[slot].set(0))

    def run_until_done(self, max_rounds: int = 1000) -> dict[str, list[int]]:
        rounds = 0
        while (self.queue or self.active) and rounds < max_rounds:
            self.step()
            rounds += 1
        return self.finished
