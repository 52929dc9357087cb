"""Paged continuous-batching engine: the slot engine's scheduler over the paged cache.

Unlike runtime/engine.py (one fixed-capacity cache row per slot), rows here map to pages
from a shared pool via the BlockAllocator — long and short requests coexist without
per-slot worst-case reservation, and freed pages are immediately reusable
(BASELINE.json "paged KV cache for prefill/decode").

Round-2 scheduler semantics (true paging, not just a pooled allocator):
- admission maps only ceil(prompt_bucket/block) pages and prefills at the BUCKET
  capacity (not the per-row worst case) — short prompts cost short prefills;
- rows GROW lazily: before each decode chunk, every active row is topped up with just
  enough pages to cover the next chunk (one batched block-table update per chunk);
- if the pool is exhausted a growing row is finished early with what it has (documented
  eviction policy; preemption/swap is out of scope at this pool scale).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.ops.sampling import SamplingParams, sample_token
from audio_flamingo_tpu.runtime.engine import Request
from audio_flamingo_tpu.runtime.paged_cache import (
    BlockAllocator,
    init_paged,
    paged_decode_chunk,
    paged_install_pages,
)


@dataclass
class PagedEngine:
    params: dict                       # AF3 params ({'encoder','adaptor','lm'})
    cfg: AF3Config
    num_rows: int = 4                  # concurrent decode rows
    num_blocks: int = 256              # shared physical pool
    block_size: int = 128
    max_blocks_per_seq: int = 16       # logical capacity per row = blocks*block_size
    chunk: int = 16
    eos_token_id: int = -1
    sampling: SamplingParams = SamplingParams()
    compute_dtype: object = jnp.bfloat16
    seed: int = 0
    kv_dtype: object = None        # jnp.int8 -> int8 page pool (half the KV HBM)

    def __post_init__(self):
        assert self.sampling.repetition_penalty == 1.0, \
            "engines do not support repetition_penalty; use runtime.generate"
        self.cache = init_paged(self.cfg.lm, self.num_rows, self.num_blocks,
                                self.block_size, self.max_blocks_per_seq,
                                self.kv_dtype or self.compute_dtype)
        self.allocator = BlockAllocator(self.num_blocks, reserve=1)  # block 0 = trash page
        # tables + lengths are HOST state (numpy), shipped to the device once per
        # decode chunk: device-side .at[].set updates compiled a fresh scatter for
        # every distinct page-grant count and cost a dispatch+sync per round
        self.tables_np = np.full((self.num_rows, self.max_blocks_per_seq), -1, np.int32)
        self.lengths_np = np.zeros((self.num_rows,), np.int32)
        self.tokens = jnp.full((self.num_rows,), self.eos_token_id, jnp.int32)
        self.done = jnp.ones((self.num_rows,), bool)
        self.rng = jax.random.PRNGKey(self.seed)
        self.queue: deque[Request] = deque()
        self.active: dict[int, tuple[Request, list[int]]] = {}
        self.finished: dict[str, list[int]] = {}

    @property
    def capacity(self) -> int:
        return self.max_blocks_per_seq * self.block_size

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def _admit(self) -> None:
        from audio_flamingo_tpu.runtime.generate import prefill

        for row in range(self.num_rows):
            if row in self.active or not self.queue:
                continue
            req = self.queue[0]
            from audio_flamingo_tpu.train.data import bucket_tokens

            t = req.ids.shape[1]
            bucket = min(max(bucket_tokens(t), self.block_size), self.capacity)
            bucket = -(-bucket // self.block_size) * self.block_size
            n_prompt = bucket // self.block_size
            # +1 page of headroom so the first decode chunk can start immediately
            headroom = 1 if n_prompt < self.max_blocks_per_seq else 0
            if len(self.allocator.free) < n_prompt + headroom:
                return  # pool exhausted; wait for releases
            self.queue.popleft()
            blocks = self.allocator.alloc(n_prompt)
            mels = jnp.asarray(req.mels) if req.mels is not None else None
            ids = jnp.asarray(req.ids)
            prompt_len = None
            if bucket != t:
                ids = jnp.concatenate(
                    [ids, jnp.full((1, bucket - t), self.eos_token_id, jnp.int32)],
                    axis=1)
                prompt_len = jnp.asarray(t, jnp.int32)
            # prefill at the BUCKET capacity: pages beyond the prompt stay unmapped
            sub_cache, logits = prefill(self.params, self.cfg, ids, mels,
                                        bucket, self.compute_dtype,
                                        prompt_len=prompt_len)
            self.cache = paged_install_pages(
                self.cache, sub_cache.k, sub_cache.v,
                jnp.asarray(blocks, jnp.int32), self.cfg.lm,
                compute_dtype=self.compute_dtype)
            self.tables_np[row] = -1
            self.tables_np[row, :n_prompt] = blocks
            self.lengths_np[row] = req.ids.shape[1]
            self.rng, k = jax.random.split(self.rng)
            first = sample_token(k, logits, self.sampling)[0]
            req.tokens.append(int(first))
            if int(first) == self.eos_token_id:
                self.finished[req.request_id] = req.tokens
                self.allocator.release(blocks)
                continue
            self.tokens = self.tokens.at[row].set(first)
            self.done = self.done.at[row].set(False)
            self.active[row] = (req, blocks)

    def _grow_pages(self) -> list[int]:
        """Top up every active row with pages covering the next chunk (host-side
        numpy table edits only). Returns rows that could NOT grow (pool exhausted)."""
        starved: list[int] = []
        for row, (req, blocks) in self.active.items():
            needed = -(-(int(self.lengths_np[row]) + self.chunk + 1) // self.block_size)
            needed = min(needed, self.max_blocks_per_seq)
            while len(blocks) < needed and self.allocator.free:
                nb = self.allocator.alloc(1)[0]
                self.tables_np[row, len(blocks)] = nb
                blocks.append(nb)
            if len(blocks) < needed:
                starved.append(row)
        return starved

    def _finish_row(self, row: int) -> None:
        req, blocks = self.active.pop(row)
        req.done = True
        self.finished[req.request_id] = req.tokens
        self.allocator.release(blocks)
        self.done = self.done.at[row].set(True)
        # point the dead row at the trash page so any residual in-chunk writes
        # cannot touch re-allocated blocks
        self.tables_np[row] = -1
        self.lengths_np[row] = 0

    def step(self) -> None:
        self._admit()
        for row in self._grow_pages():  # eviction policy: starved rows finish early
            self._finish_row(row)
        if not self.active:
            return
        cache = self.cache._replace(block_tables=jnp.asarray(self.tables_np),
                                    lengths=jnp.asarray(self.lengths_np))
        self.cache, self.tokens, self.done, self.rng, out = paged_decode_chunk(
            self.params["lm"], self.cfg.lm, cache, self.tokens, self.done, self.rng,
            chunk=self.chunk, sampling=self.sampling, eos_token_id=self.eos_token_id,
            compute_dtype=self.compute_dtype)
        out = np.asarray(out)
        done = np.asarray(self.done)
        self.lengths_np = np.asarray(self.cache.lengths).copy()
        for row, (req, blocks) in list(self.active.items()):
            budget = req.max_new_tokens - len(req.tokens)
            emitted = [int(t) for t in out[row][:budget]]
            if self.eos_token_id in emitted:
                emitted = emitted[: emitted.index(self.eos_token_id) + 1]
            req.tokens.extend(emitted)
            full = self.lengths_np[row] >= self.capacity - self.chunk - 1
            if done[row] or full or len(req.tokens) >= req.max_new_tokens:
                self._finish_row(row)

    def run_until_done(self, max_rounds: int = 1000) -> dict[str, list[int]]:
        rounds = 0
        while (self.queue or self.active) and rounds < max_rounds:
            self.step()
            rounds += 1
        return self.finished
