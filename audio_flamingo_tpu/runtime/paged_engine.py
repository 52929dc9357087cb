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
- pool exhaustion PREEMPTS a starved row (KV pages swap to the host, the request
  requeues at the front and resumes into fresh pages later — vLLM swap semantics);
  a lone row in an exhausted pool finishes early as the last resort.

Also here: automatic prefix caching (PrefixStore, shared read-only prompt pages) and
Sarathi-style chunked prefill — see docs/SERVING.md for the architecture writeup.
"""

from __future__ import annotations

import hashlib
from collections import deque
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import AF3Config
from audio_flamingo_tpu.ops.sampling import (SamplingParams, processor_flags,
                                             row_sampling)
from audio_flamingo_tpu.runtime.engine import (Request, _emit_first_token,
                                               _finish_request_metrics,
                                               _postprocess_chunk_row,
                                               _start_request_metrics,
                                               record_spec_stats)
from audio_flamingo_tpu.runtime.paged_cache import (
    BlockAllocator,
    init_paged,
    paged_decode_chunk,
    paged_decode_spec_chunk,
    paged_decode_spec_chunk_sampled,
    paged_install_pages,
    paged_prefill_suffix,
    paged_restore_pages,
)


def _block_keys(ids: np.ndarray, block: int, mels_digest: bytes | None,
                first_audio: int | None) -> list[bytes]:
    """Chained content hashes, one per FULL prompt block (vLLM-style prefix keys).

    Blocks strictly before the first audio placeholder hash over token ids only, so
    a shared text system prompt is shared between audio and text-only requests; any
    block at/after it also folds in the mel digest (audio embeds are scattered over
    placeholder positions, so identical ids with different audio differ from there on).
    """
    keys: list[bytes] = []
    parent = b"af-prefix-v1"
    for i in range(len(ids) // block):
        h = hashlib.blake2b(parent, digest_size=16)
        h.update(ids[i * block:(i + 1) * block].astype(np.int32).tobytes())
        if mels_digest is not None and (first_audio is None
                                        or (i + 1) * block > first_audio):
            h.update(mels_digest)
        parent = h.digest()
        keys.append(parent)
    return keys


@dataclass
class PrefixStore:
    """Host-side registry of shareable prompt pages: block-hash -> physical page.

    Pages registered here are OWNED by the store (not the allocator) until evicted;
    active rows hold refcounts. Eviction (LRU over refcount-0 entries) returns pages
    to the allocator only under pool pressure, so completed prefixes stay warm.
    """

    entries: dict = field(default_factory=dict)   # key -> [page, refcount, tick]
    tick: int = 0
    hits: int = 0
    misses: int = 0

    def longest_run(self, keys: list[bytes]) -> int:
        n = 0
        for k in keys:
            if k not in self.entries:
                break
            n += 1
        return n

    def acquire(self, keys: list[bytes]) -> list[int]:
        self.tick += 1
        pages = []
        for k in keys:
            e = self.entries[k]
            e[1] += 1
            e[2] = self.tick
            pages.append(e[0])
        self.hits += len(keys)
        return pages

    def register(self, key: bytes, page: int) -> bool:
        """Transfer ownership of `page` to the store with one reference held by the
        caller. Returns False (caller keeps the page private) if the key exists."""
        if key in self.entries:
            return False
        self.tick += 1
        self.entries[key] = [page, 1, self.tick]
        self.misses += 1
        return True

    def release(self, keys: list[bytes]) -> None:
        for k in keys:
            self.entries[k][1] -= 1

    def evict(self, n: int) -> list[int]:
        """Free up to n refcount-0 pages, least recently used first."""
        victims = sorted((e[2], k) for k, e in self.entries.items() if e[1] == 0)[:n]
        return [self.entries.pop(k)[0] for _, k in victims]


@partial(jax.jit, static_argnames=("cfg", "start", "compute_dtype"))
def _suffix_embeds(params, cfg, ids, mels, *, start: int, compute_dtype):
    """Input embeddings for prompt tokens [start:] (prefix-cache suffix prefill).

    mels=None when the audio placeholders (if any) lie wholly inside the reused
    prefix — then this is a plain token-embedding gather and the encoder never runs."""
    from audio_flamingo_tpu.models import af3

    return af3.build_input_embeds(params, cfg, ids, mels, compute_dtype)[:, start:]


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
    prefix_cache: bool = False     # share full prompt blocks across requests
    prefill_chunk: int = 0         # >0: chunk long prefills (tokens, multiple of
    #                                block_size) so decode rounds interleave with
    #                                them (Sarathi-style tail-latency control)
    preempt: bool = True           # pool pressure: swap a row's KV to the host and
    #                                resume later instead of truncating its output
    metrics: object = None         # optional utils.metrics.MetricsLogger sink
    # speculative decoding (greedy-only, mirrors runtime/engine.Engine): the
    # draft proposes spec_k tokens per row per round on a dense SlotCache; the
    # target verifies each k+1 block THROUGH ITS PAGES (paged_decode_spec_chunk)
    draft_params: dict | None = None
    draft_cfg: object = None
    spec_k: int = 4
    spec_rounds: int = 4
    spec_accept_sim: float | None = None   # Bernoulli-injection measurement mode
    # acceptance guardrail (engine.record_spec_stats docstring): auto-disable
    # speculation when the live acceptance estimate sits below break-even
    spec_guard: bool = True
    spec_guard_min_accept: float = 0.5
    spec_guard_warmup: int = 64
    spec_disabled: bool = False

    def __post_init__(self):
        assert self.prefill_chunk % self.block_size == 0, \
            "prefill_chunk must be a multiple of block_size"
        if self.draft_params is not None:
            assert self.draft_cfg is not None
            # preemption would have to swap (or rebuild) the draft's dense rows
            # alongside the target's pages — out of scope. Prefix caching and
            # chunked prefill COMPOSE: the draft always prefills dense over the
            # full ids at activation, however the target's pages were built
            assert not self.preempt, \
                "speculative paged serving requires preempt=False"
            from audio_flamingo_tpu.runtime.engine import init_slot_cache

            self.d_cache = init_slot_cache(self.draft_cfg, self.num_rows,
                                           self.capacity, self.compute_dtype)
        self.prefilling: dict | None = None   # at most one chunked prefill in flight
        self.swapped: dict[str, dict] = {}    # request_id -> host-side KV pages
        self.preemptions = 0
        self.request_metrics: dict[str, dict] = {}
        self.cache = init_paged(self.cfg.lm, self.num_rows, self.num_blocks,
                                self.block_size, self.max_blocks_per_seq,
                                self.kv_dtype or self.compute_dtype)
        self.allocator = BlockAllocator(self.num_blocks, reserve=1)  # block 0 = trash page
        self.store = PrefixStore() if self.prefix_cache else None
        # tables + lengths are HOST state (numpy), shipped to the device once per
        # decode chunk: device-side .at[].set updates compiled a fresh scatter for
        # every distinct page-grant count and cost a dispatch+sync per round
        self.tables_np = np.full((self.num_rows, self.max_blocks_per_seq), -1, np.int32)
        self.lengths_np = np.zeros((self.num_rows,), np.int32)
        self.tokens = jnp.full((self.num_rows,), self.eos_token_id, jnp.int32)
        self.done = jnp.ones((self.num_rows,), bool)
        self.rng = jax.random.PRNGKey(self.seed)
        self.queue: deque[Request] = deque()
        # row -> (request, private pages, held prefix-store keys)
        self.active: dict[int, tuple[Request, list[int], list[bytes]]] = {}
        self.finished: dict[str, list[int]] = {}
        self.row_params: list[SamplingParams] = [self.sampling] * self.num_rows
        self.rows = row_sampling(self.row_params)
        # per-row prompt+generated history (-1 = empty) for the repetition-penalty /
        # n-gram processors; device-resident across chunks, reseeded on (re)admission
        self.hist = jnp.full((self.num_rows, self.capacity), -1, jnp.int32)

    @property
    def capacity(self) -> int:
        return self.max_blocks_per_seq * self.block_size

    def offload_pool(self) -> None:
        """Swap the page pool (+ scales/tables/lengths) to host RAM, freeing
        its HBM between serving phases — e.g. a GRPO iteration's strictly
        sequential rollout -> update on one chip (VERDICT r4 #5): the update's
        policy grads and chunked logp must not co-reside with serving pages.
        The engine must be idle (no active rows, no in-flight prefill);
        restore_pool() re-uploads. Host scheduling state (allocator, tables_np,
        prefix store) is untouched, so restored pages serve prefix-cache hits
        exactly as before the swap."""
        assert not self.active and self.prefilling is None, \
            "offload_pool: engine has in-flight work"
        assert self.cache is not None
        self._host_pool = jax.device_get(self.cache)
        self.cache = None
        import gc

        gc.collect()   # drop the device pool NOW, not at the next GC cycle

    def restore_pool(self) -> None:
        """Re-upload a pool swapped out by offload_pool()."""
        assert self.cache is None and getattr(self, "_host_pool", None) is not None
        host = self._host_pool
        self._host_pool = None
        self.cache = jax.device_put(host)

    def _speculating(self) -> bool:
        return (self.draft_params is not None and not self.spec_disabled
                and self.sampling.greedy
                and self.sampling.repetition_penalty == 1.0
                and self.sampling.no_repeat_ngram_size == 0
                and self.sampling.min_new_tokens == 0)

    def _spec_sampled(self) -> bool:
        """Non-greedy + draft: Leviathan sampled speculation, one warp for all
        rows (engine.decode_spec_chunk_sampled docstring)."""
        return (self.draft_params is not None and not self.spec_disabled
                and not self.sampling.greedy
                and self.sampling.repetition_penalty == 1.0
                and self.sampling.no_repeat_ngram_size == 0
                and self.sampling.min_new_tokens == 0)

    def submit(self, req: Request) -> None:
        # prompts longer than row capacity would negative-pad in _admit after page
        # allocation (leaking pages); reject at the boundary instead
        assert req.ids.shape[1] <= self.capacity, (
            f"prompt ({req.ids.shape[1]} tokens) exceeds row capacity "
            f"({self.capacity} = max_blocks_per_seq * block_size)")
        if req.sampling is not None:
            assert not self._speculating() \
                or (req.sampling.greedy
                    and req.sampling.repetition_penalty == 1.0
                    and req.sampling.no_repeat_ngram_size == 0), \
                "the speculative engine path is greedy-only (no history warpers)"
            assert not self._spec_sampled() or req.sampling == self.sampling, \
                ("sampled speculation applies ONE warp to every row; "
                 "per-request sampling must equal the engine's")
        assert not ((self._speculating() or self._spec_sampled())
                    and (req.min_new_tokens or req.stop or req.logprobs)), \
            "min_new_tokens/stop/logprobs are not supported on the speculative path"
        _start_request_metrics(req)
        self.queue.append(req)

    def submit_beam(self, req) -> None:
        """Queue a beam-search request ([hf] generate(num_beams=K) role), served
        by a BeamLane time-sliced against paged decode rounds. The lane owns its
        K dense cache rows (the per-step parent reorder cannot share the paged
        pool without per-step copy-on-write page forks); results appear in
        `finished_beams` as (sequences [R, max_new], scores [R])."""
        from audio_flamingo_tpu.runtime.beam_lane import attach_beam_lane

        attach_beam_lane(self, family="af3").submit(req)

    @property
    def finished_beams(self) -> dict:
        from audio_flamingo_tpu.runtime.beam_lane import finished_beams

        return finished_beams(self)

    def _seed_hist(self, row: int, req: Request) -> None:
        from audio_flamingo_tpu.runtime.engine import seed_history

        self.hist = seed_history(self.hist, row, self.capacity, req,
                                 req.sampling or self.sampling)

    def _draft_prefill(self, row: int, req: Request, bucket: int) -> None:
        """Prefill the DRAFT LM dense cache for a newly activated row (spec path).

        Runs over the FULL prompt ids regardless of how the target's pages were
        built (prefix hits / chunked prefill) — the draft has no pages to share
        and its prefill is cheap (draft models are small)."""
        from audio_flamingo_tpu.runtime.engine import draft_prefill_into_slot

        ids = jnp.asarray(req.ids)
        t = ids.shape[1]
        if bucket != t:
            ids = jnp.concatenate(
                [ids, jnp.full((1, bucket - t), self.eos_token_id, jnp.int32)],
                axis=1)
        self.d_cache = draft_prefill_into_slot(
            self.draft_params, self.draft_cfg, self.d_cache, row, ids,
            slot_capacity=self.capacity, compute_dtype=self.compute_dtype)

    def _free_pages(self) -> int:
        n = len(self.allocator.free)
        if self.store is not None:
            n += sum(1 for e in self.store.entries.values() if e[1] == 0)
        return n

    def _alloc(self, n: int) -> list[int]:
        short = n - len(self.allocator.free)
        if short > 0 and self.store is not None:
            self.allocator.release(self.store.evict(short))
        return self.allocator.alloc(n)

    def _admit(self) -> None:
        from audio_flamingo_tpu.runtime.generate import prefill

        for row in range(self.num_rows):
            if row in self.active or not self.queue:
                continue
            if self.prefilling is not None and self.prefilling["row"] == row:
                continue
            req = self.queue[0]
            if req.request_id in self.swapped:
                if not self._resume_row(req, row):
                    return  # not enough pages yet to bring the KV back
                continue
            from audio_flamingo_tpu.train.data import bucket_tokens

            t = req.ids.shape[1]
            bs = self.block_size
            bucket = min(max(bucket_tokens(t), bs), self.capacity)
            bucket = -(-bucket // bs) * bs
            n_prompt = bucket // bs

            # prefix-cache lookup: longest run of known full prompt blocks, rounded
            # DOWN to a power of two (bounds the (prefix, suffix) compile universe);
            # >=1 real token must still prefill so last-token logits exist
            keys: list[bytes] = []
            audio_pos = np.empty((0,), np.int64)
            n_hit = 0
            if self.store is not None:
                ids_np = np.asarray(req.ids[0])
                audio_pos = np.nonzero(ids_np == self.cfg.audio_token_id)[0]
                mels_digest = None
                first_audio = None
                if req.mels is not None:
                    mels_digest = hashlib.blake2b(
                        np.ascontiguousarray(req.mels).tobytes(),
                        digest_size=16).digest()
                    first_audio = int(audio_pos[0]) if audio_pos.size else None
                keys = _block_keys(ids_np, bs, mels_digest, first_audio)
                run = min(self.store.longest_run(keys), (t - 1) // bs)
                n_hit = 1 << (run.bit_length() - 1) if run > 0 else 0

            start0 = n_hit * bs
            if self.prefill_chunk and bucket - start0 > self.prefill_chunk:
                # one chunked prefill at a time; a failed start (pool short)
                # also stops admission so FIFO order holds
                if (self.prefilling is not None
                        or not self._start_chunked_prefill(req, row, t, bucket,
                                                           n_hit, keys, audio_pos)):
                    return
                continue

            # +1 page of headroom so the first decode chunk can start immediately
            headroom = 1 if n_prompt < self.max_blocks_per_seq else 0
            if self._free_pages() < n_prompt - n_hit + headroom:
                return  # pool exhausted; wait for releases
            self.queue.popleft()
            held: list[bytes] = list(keys[:n_hit])
            prefix_pages = self.store.acquire(held) if n_hit else []
            blocks = self._alloc(n_prompt - n_hit)
            mels = jnp.asarray(req.mels) if req.mels is not None else None
            ids = jnp.asarray(req.ids)
            if bucket != t:
                ids = jnp.concatenate(
                    [ids, jnp.full((1, bucket - t), self.eos_token_id, jnp.int32)],
                    axis=1)

            if n_hit:
                start = n_hit * bs
                # skip the ENCODER when every audio token sits inside the reused
                # prefix (the chat case: same clip + growing history) — the whole
                # audio tower's work rides in on the shared pages
                mels_arg = mels if (audio_pos.size
                                    and int(audio_pos[-1]) >= start) else None
                emb = _suffix_embeds(self.params, self.cfg, ids, mels_arg,
                                     start=start, compute_dtype=self.compute_dtype)
                sub_k, sub_v, logits = paged_prefill_suffix(
                    self.params["lm"], self.cfg.lm, self.cache,
                    jnp.asarray(prefix_pages, jnp.int32), emb,
                    jnp.asarray(t, jnp.int32), n_prefix_pages=n_hit,
                    suffix_len=bucket - start, compute_dtype=self.compute_dtype)
                self.cache = paged_install_pages(
                    self.cache, sub_k, sub_v, jnp.asarray(blocks, jnp.int32),
                    self.cfg.lm, compute_dtype=self.compute_dtype)
            else:
                prompt_len = jnp.asarray(t, jnp.int32) if bucket != t else None
                # prefill at the BUCKET capacity: pages beyond the prompt stay unmapped
                sub_cache, logits = prefill(self.params, self.cfg, ids, mels,
                                            bucket, self.compute_dtype,
                                            prompt_len=prompt_len)
                self.cache = paged_install_pages(
                    self.cache, sub_cache.k, sub_cache.v,
                    jnp.asarray(blocks, jnp.int32), self.cfg.lm,
                    compute_dtype=self.compute_dtype)
            table_pages = prefix_pages + blocks

            # register this prompt's own full blocks (never written by decode:
            # writes land at positions >= t) so future prompts can share them
            if self.store is not None:
                for i in range(n_hit, t // bs):
                    if self.store.register(keys[i], table_pages[i]):
                        blocks.remove(table_pages[i])
                        held.append(keys[i])

            self.tables_np[row] = -1
            self.tables_np[row, :n_prompt] = table_pages
            self.lengths_np[row] = t
            self.rng, k = jax.random.split(self.rng)
            first, finished, req_sampling = _emit_first_token(self, req, logits, k)
            if finished:
                self.allocator.release(blocks)
                if self.store is not None and held:
                    self.store.release(held)
                self.tables_np[row] = -1
                continue
            self.row_params[row] = req_sampling
            self.rows = row_sampling(self.row_params)
            self._seed_hist(row, req)
            if self._speculating() or self._spec_sampled():
                self._draft_prefill(row, req, bucket)
            self.tokens = self.tokens.at[row].set(first)
            self.done = self.done.at[row].set(False)
            self.active[row] = (req, blocks, held)

    def _preempt_row(self, row: int) -> None:
        """Swap a starved row's KV pages to the host and requeue it at the FRONT
        (vLLM-style preemption: pool pressure defers the request, never truncates
        it). One device sync per preemption — scheduling-path cost, not decode."""
        req, blocks, held = self.active.pop(row)
        bs = self.block_size
        n_tok = int(self.lengths_np[row])
        n_pages = -(-n_tok // bs)
        # power-of-two padded gather (pad reads the trash page) — one compiled
        # gather per page bucket, mirroring paged_restore_pages
        p2 = 1 << max(0, (n_pages - 1).bit_length())
        ids = np.zeros((p2,), np.int32)
        ids[:n_pages] = self.tables_np[row, :n_pages]
        ids_j = jnp.asarray(ids)

        def fetch(pool):
            return np.asarray(jnp.take(pool, ids_j, axis=1))[:, :n_pages]

        sw = dict(n_tok=n_tok, last=int(np.asarray(self.tokens)[row]),
                  k=fetch(self.cache.k), v=fetch(self.cache.v), ks=None, vs=None)
        if self.cache.quantized:
            sw["ks"] = fetch(self.cache.k_scale)
            sw["vs"] = fetch(self.cache.v_scale)
        self.swapped[req.request_id] = sw
        self.preemptions += 1
        self.allocator.release(blocks)
        if self.store is not None and held:
            self.store.release(held)
        self.done = self.done.at[row].set(True)
        self.tables_np[row] = -1
        self.lengths_np[row] = 0
        self.queue.appendleft(req)

    def _resume_row(self, req: Request, row: int) -> bool:
        """Install a swapped request's KV into fresh pages and reactivate it."""
        sw = self.swapped[req.request_id]
        bs = self.block_size
        n_pages = -(-sw["n_tok"] // bs)
        if self._free_pages() < n_pages + 1:
            return False
        self.queue.popleft()
        del self.swapped[req.request_id]
        blocks = self._alloc(n_pages)
        # pad the page count to a power of two (one compiled restore per bucket);
        # pad slots scatter into the trash page
        p2 = 1 << max(0, (n_pages - 1).bit_length())
        ids = np.zeros((p2,), np.int32)
        ids[:n_pages] = blocks

        def pad(a):
            out = np.zeros((a.shape[0], p2) + a.shape[2:], a.dtype)
            out[:, :n_pages] = a
            return jnp.asarray(out)

        self.cache = paged_restore_pages(
            self.cache, pad(sw["k"]), pad(sw["v"]),
            None if sw["ks"] is None else pad(sw["ks"]),
            None if sw["vs"] is None else pad(sw["vs"]),
            jnp.asarray(ids))
        self.tables_np[row] = -1
        self.tables_np[row, :n_pages] = blocks
        self.lengths_np[row] = sw["n_tok"]
        self.row_params[row] = req.sampling or self.sampling
        self.rows = row_sampling(self.row_params)
        self._seed_hist(row, req)
        self.tokens = self.tokens.at[row].set(sw["last"])
        self.done = self.done.at[row].set(False)
        self.active[row] = (req, blocks, [])
        return True

    def _start_chunked_prefill(self, req: Request, row: int, t: int, bucket: int,
                               n_hit: int, keys: list[bytes],
                               audio_pos: np.ndarray) -> bool:
        """Reserve a row + pages and compute embeddings for a chunked prefill.

        The encoder (if any) runs ONCE here; the LM prefill is then fed chunk by
        chunk from `_prefill_step`, one chunk per engine round, so active rows keep
        decoding in between (Sarathi-style stall control). Returns False when the
        pool cannot hold the prompt's pages yet."""
        bs = self.block_size
        start0 = n_hit * bs
        # cover the TRUE prompt only (pure-pad chunks are never prefilled)
        n_chunks = -(-(t - start0) // self.prefill_chunk)
        ce = min(start0 + n_chunks * self.prefill_chunk, bucket)
        headroom = 1 if ce // bs < self.max_blocks_per_seq else 0
        if self._free_pages() < (ce - start0) // bs + headroom:
            return False
        self.queue.popleft()
        held = list(keys[:n_hit])
        prefix_pages = self.store.acquire(held) if n_hit else []
        own = self._alloc((ce - start0) // bs)
        ids = jnp.asarray(req.ids)
        if bucket != t:
            ids = jnp.concatenate(
                [ids, jnp.full((1, bucket - t), self.eos_token_id, jnp.int32)],
                axis=1)
        mels = jnp.asarray(req.mels) if req.mels is not None else None
        mels_arg = mels if (req.mels is not None
                            and (n_hit == 0 or (audio_pos.size
                                                and int(audio_pos[-1]) >= start0))) \
            else None
        emb = _suffix_embeds(self.params, self.cfg, ids, mels_arg, start=0,
                             compute_dtype=self.compute_dtype)
        self.prefilling = dict(req=req, row=row, t=t, bucket=bucket, n_hit=n_hit,
                               keys=keys, held=held, prefix_pages=prefix_pages,
                               own=own, emb=emb, done=start0, ce=ce)
        return True

    def _prefill_step(self) -> None:
        """Advance the in-flight chunked prefill by ONE chunk (then return to the
        decode loop). The chunk runs as a suffix prefill against the request's own
        already-filled pages (+ any shared prefix pages)."""
        st = self.prefilling
        if st is None:
            return
        bs = self.block_size
        start, ce = st["done"], st["ce"]
        end = min(start + self.prefill_chunk, ce)
        table_pages = st["prefix_pages"] + st["own"]
        n_pref = start // bs
        plen = st["t"] if end >= st["t"] else end
        sub_k, sub_v, logits = paged_prefill_suffix(
            self.params["lm"], self.cfg.lm, self.cache,
            jnp.asarray(table_pages[:n_pref], jnp.int32), st["emb"][:, start:end],
            jnp.asarray(plen, jnp.int32), n_prefix_pages=n_pref,
            suffix_len=end - start, compute_dtype=self.compute_dtype)
        self.cache = paged_install_pages(
            self.cache, sub_k, sub_v,
            jnp.asarray(table_pages[n_pref: end // bs], jnp.int32),
            self.cfg.lm, compute_dtype=self.compute_dtype)
        st["done"] = end
        if end < st["t"]:
            return
        # final chunk: register shareable blocks, sample the first token, activate
        row, req, t = st["row"], st["req"], st["t"]
        blocks, held, keys = st["own"], st["held"], st["keys"]
        self.prefilling = None
        if self.store is not None:
            for i in range(st["n_hit"], t // bs):
                if self.store.register(keys[i], table_pages[i]):
                    blocks.remove(table_pages[i])
                    held.append(keys[i])
        self.tables_np[row] = -1
        self.tables_np[row, :len(table_pages)] = table_pages
        self.lengths_np[row] = t
        self.rng, k = jax.random.split(self.rng)
        first, finished, req_sampling = _emit_first_token(self, req, logits, k)
        if finished:
            self.allocator.release(blocks)
            if self.store is not None and held:
                self.store.release(held)
            self.tables_np[row] = -1
            return
        self.row_params[row] = req_sampling
        self.rows = row_sampling(self.row_params)
        self._seed_hist(row, req)
        if self._speculating() or self._spec_sampled():
            self._draft_prefill(row, req, st["bucket"])
        self.tokens = self.tokens.at[row].set(first)
        self.done = self.done.at[row].set(False)
        self.active[row] = (req, blocks, held)

    def _step_budget(self) -> int:
        """Max tokens any row can emit (and write KV for) in one decode round."""
        if self._speculating() or self._spec_sampled():
            return self.spec_rounds * (self.spec_k + 1)
        return self.chunk

    def _grow_pages(self) -> list[int]:
        """Top up every active row with pages covering the next chunk (host-side
        numpy table edits only). Returns rows that could NOT grow (pool exhausted)."""
        starved: list[int] = []
        for row, (req, blocks, held) in self.active.items():
            needed = -(-(int(self.lengths_np[row]) + self._step_budget() + 1)
                       // self.block_size)
            needed = min(needed, self.max_blocks_per_seq)
            mapped = int((self.tables_np[row] >= 0).sum())
            while mapped < needed:
                if not self.allocator.free and self.store is not None:
                    self.allocator.release(self.store.evict(1))
                if not self.allocator.free:
                    break
                nb = self.allocator.alloc(1)[0]
                self.tables_np[row, mapped] = nb
                blocks.append(nb)
                mapped += 1
            if mapped < needed:
                starved.append(row)
        return starved

    def _finish_row(self, row: int) -> None:
        req, blocks, held = self.active.pop(row)
        req.done = True
        self.finished[req.request_id] = req.tokens
        _finish_request_metrics(self, req)
        self.allocator.release(blocks)
        if self.store is not None and held:
            self.store.release(held)
        self.done = self.done.at[row].set(True)
        # point the dead row at the trash page so any residual in-chunk writes
        # cannot touch re-allocated blocks
        self.tables_np[row] = -1
        self.lengths_np[row] = 0

    def step(self) -> None:
        from audio_flamingo_tpu.runtime.beam_lane import step_beam_lane

        self._admit()
        self._prefill_step()            # one chunk, then back to decoding
        starved = self._grow_pages()
        while starved and self.preempt and len(self.active) > 1:
            # swap one starved row out; its freed pages may unblock the rest
            # (re-check), and it resumes from the queue front later
            self._preempt_row(starved[-1])
            starved = self._grow_pages()
        for row in starved:             # last resort (lone row in an exhausted
            self._finish_row(row)       # pool): finish early with what it has
        if not self.active:
            step_beam_lane(self)
            return
        cache = self.cache._replace(block_tables=jnp.asarray(self.tables_np),
                                    lengths=jnp.asarray(self.lengths_np))
        if self._speculating():
            self.rng, spec_rng = jax.random.split(self.rng)
            (self.cache, d_k, d_v, self.tokens, self.done, out,
             valid) = paged_decode_spec_chunk(
                self.params["lm"], self.draft_params, self.cfg.lm,
                self.draft_cfg, cache, self.d_cache.k, self.d_cache.v,
                self.tokens, self.done, spec_rng,
                k=self.spec_k, rounds=self.spec_rounds,
                eos_token_id=self.eos_token_id,
                compute_dtype=self.compute_dtype,
                accept_sim=self.spec_accept_sim)
            self.d_cache = self.d_cache._replace(k=d_k, v=d_v)
            out = np.asarray(out)
            valid = np.asarray(valid)
            record_spec_stats(self, valid, list(self.active),
                              self.spec_rounds, self.spec_k)
            row_tokens = [out[r][valid[r]].tolist()
                          for r in range(self.num_rows)]
            lp = None
        elif self._spec_sampled():
            (self.cache, d_k, d_v, self.tokens, self.done, self.rng, out,
             valid) = paged_decode_spec_chunk_sampled(
                self.params["lm"], self.draft_params, self.cfg.lm,
                self.draft_cfg, cache, self.d_cache.k, self.d_cache.v,
                self.tokens, self.done, self.rng,
                k=self.spec_k, rounds=self.spec_rounds,
                eos_token_id=self.eos_token_id, sampling=self.sampling,
                compute_dtype=self.compute_dtype)
            self.d_cache = self.d_cache._replace(k=d_k, v=d_v)
            out = np.asarray(out)
            valid = np.asarray(valid)
            record_spec_stats(self, valid, list(self.active),
                              self.spec_rounds, self.spec_k)
            row_tokens = [out[r][valid[r]].tolist()
                          for r in range(self.num_rows)]
            lp = None
        else:
            min_left = np.zeros((self.num_rows,), np.int32)
            for row, (req, _, _) in self.active.items():
                want = max(req.min_new_tokens,
                           (req.sampling or self.sampling).min_new_tokens)
                min_left[row] = max(want - len(req.tokens), 0)
            mixed = any(not (req.sampling or self.sampling).greedy
                        for req, _, _ in self.active.values())
            want_lp = any(req.logprobs for req, _, _ in self.active.values())
            use_min = bool(min_left.any())
            use_pen, ngram_ns = processor_flags(
                req.sampling or self.sampling for req, _, _ in self.active.values())
            (self.cache, self.tokens, self.done, self.rng, out, lp,
             self.hist) = paged_decode_chunk(
                self.params["lm"], self.cfg.lm, cache, self.tokens, self.done,
                self.rng, self.rows, jnp.asarray(min_left), self.hist,
                chunk=self.chunk, eos_token_id=self.eos_token_id,
                compute_dtype=self.compute_dtype,
                mixed_sampling=mixed, want_logprobs=want_lp, use_min_new=use_min,
                use_penalty=use_pen, ngram_ns=ngram_ns)
            out = np.asarray(out)
            lp = np.asarray(lp)
            row_tokens = [out[r].tolist() for r in range(self.num_rows)]
        done = np.asarray(self.done).copy()  # writable: stop/capacity edits
        self.lengths_np = np.asarray(self.cache.lengths).copy()
        budget = self._step_budget()
        for row, (req, blocks, held) in list(self.active.items()):
            if _postprocess_chunk_row(self, req, row_tokens[row],
                                      lp[row] if (lp is not None
                                                  and req.logprobs) else None):
                done[row] = True
            full = self.lengths_np[row] >= self.capacity - budget - 1
            if done[row] or full or len(req.tokens) >= req.max_new_tokens:
                self._finish_row(row)
        step_beam_lane(self)

    def run_until_done(self, max_rounds: int = 1000) -> dict[str, list[int]]:
        from audio_flamingo_tpu.runtime.beam_lane import beam_lane_busy

        rounds = 0
        while ((self.queue or self.active or self.prefilling is not None
                or beam_lane_busy(self))
               and rounds < max_rounds):
            self.step()
            rounds += 1
        return self.finished
