"""Sequence/context parallelism: Ulysses (all-to-all on heads) + ring attention.

Replaces the reference lineage's `llava/train/sequence_parallel/` (VILA/LongVILA hybrid
ring+Ulysses, SURVEY.md §2.9 SP row) with XLA-collective implementations:

- `ulysses_attention`: inputs sharded on sequence; `all_to_all` swaps the seq shard for a
  head shard so each device computes full-sequence attention for H/sp heads, then swaps
  back. One collective pair per attention call, rides ICI.
- `ring_attention`: inputs sharded on sequence; KV blocks rotate around the ring via
  `ppermute` with online-softmax accumulation (flash-style, O(T/sp) memory per device).
  Causal masking uses absolute block offsets.

Both are exact (== full attention) — tested on the 8-fake-device CPU mesh, forward AND
backward.

Two call styles:
- `*_local(q, k, v, axis, ...)`: for code ALREADY inside a `shard_map` over `axis`
  (the whole-LM-stack SP forward, models/qwen2.py forward_sp — lets the layer loop be a
  single `lax.scan` inside one shard_map instead of L nested shard_maps).
- `ring_attention(q, k, v, mesh, axis, ...)` / `ulysses_attention(...)`: standalone
  wrappers that open their own shard_map (op-level tests, ad-hoc use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_flamingo_tpu.ops.attention import NEG_INF, gqa_attention


def ulysses_attention_local(q, k, v, axis: str, causal: bool = False) -> jnp.ndarray:
    """Ulysses attention for callers already inside a shard_map over `axis`.

    q [B, T/sp, H, D], k/v [B, T/sp, Hkv, D] are the LOCAL sequence shards. all_to_all
    swaps the sequence shard for a head shard, full-sequence attention runs on H/sp
    heads per device, and a second all_to_all swaps back. Requires H % sp == 0; if
    Hkv % sp != 0, KV heads are first repeated up to H (GQA expansion — extra comms,
    exact numerics).
    """
    sp = jax.lax.axis_size(axis)
    h, hkv = q.shape[2], k.shape[2]
    assert h % sp == 0, (h, sp)
    if hkv % sp != 0:  # padding fallback: expand GQA groups so heads split evenly
        rep = h // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    # [B, T/sp, H, D] -> [B, T, H/sp, D]
    q = jax.lax.all_to_all(q, axis, split_axis=2, concat_axis=1, tiled=True)
    k = jax.lax.all_to_all(k, axis, split_axis=2, concat_axis=1, tiled=True)
    v = jax.lax.all_to_all(v, axis, split_axis=2, concat_axis=1, tiled=True)
    mask = None
    if causal:
        tt = q.shape[1]
        ids = jnp.arange(tt)
        mask = (ids[None, :] <= ids[:, None])[None, None]
    out = gqa_attention(q, k, v, mask=mask)
    return jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2, tiled=True)


def ring_attention_local(q, k, v, axis: str, causal: bool = False,
                         impl: str = "flash") -> jnp.ndarray:
    """Ring attention for callers already inside a shard_map over `axis`.

    q [B, T/sp, H, D], k/v [B, T/sp, Hkv, D] local sequence shards; KV rotates around
    the ring via ppermute with log-sum-exp block merging. Exact == full attention.

    impl="flash" (default): each ring step runs the Pallas flash kernel over the
    resident KV block — O(tile) score memory, so per-device memory is O(T/sp) as the
    mechanism promises even at 32k+ training lengths. Block partials (out_i, lse_i)
    merge exactly: lse = logaddexp(lse, lse_i); out = Σ out_i·exp(lse_i − lse).
    Each device picks its block relation at runtime (lax.switch on a traced index,
    fine under SPMD): future block → masked constant, diagonal → causal flash,
    past → full flash.

    impl="xla": reference path materializing per-step f32 scores [b, blk, h, blk]
    (O((T/sp)^2) memory) — kept for cross-validation tests.
    """
    sp = jax.lax.axis_size(axis)
    b, block, h, d = q.shape
    hkv = k.shape[2]
    g = h // hkv

    idx = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    if impl == "flash":
        from audio_flamingo_tpu.ops.pallas.flash_attention import flash_attention_lse

        def full_blk(kv):
            return flash_attention_lse(q, kv[0], kv[1], causal=False)

        def diag_blk(kv):
            # same global offset for q and k rows -> local causal comparison is exact
            return flash_attention_lse(q, kv[0], kv[1], causal=True)

        def masked_blk(kv):
            # derive outputs arithmetically from q (and kv) so they carry the
            # device-varying type through lax.switch under shard_map
            zero = q * 0 + (kv[0][..., :1, :] * 0).sum()
            return zero, zero[..., 0].astype(jnp.float32) + NEG_INF

        def step(i, carry):
            acc, lse, k_blk, v_blk = carry
            if causal:
                src = (idx - i) % sp  # global block index this KV shard holds now
                case = jnp.clip(idx - src + 1, 0, 2)  # 0 future, 1 diagonal, 2 past
                out_i, lse_i = jax.lax.switch(
                    case, [masked_blk, diag_blk, full_blk], (k_blk, v_blk))
            else:
                out_i, lse_i = full_blk((k_blk, v_blk))
            lse_new = jnp.logaddexp(lse, lse_i)
            w_old = jnp.exp(lse - lse_new)[..., None]
            w_new = jnp.exp(lse_i - lse_new)[..., None]
            acc = acc * w_old + out_i.astype(jnp.float32) * w_new
            k_nxt = jax.lax.ppermute(k_blk, axis, perm)
            v_nxt = jax.lax.ppermute(v_blk, axis, perm)
            return acc, lse_new, k_nxt, v_nxt

        acc0 = q.astype(jnp.float32) * 0.0
        lse0 = jnp.zeros((b, block, h), jnp.float32) + NEG_INF + acc0[..., 0]
        acc, _, _, _ = jax.lax.fori_loop(0, sp, step, (acc0, lse0, k, v))
        return acc.astype(q.dtype)

    assert impl == "xla", impl
    qf = q.astype(jnp.float32)
    # accumulators derived arithmetically from qf so they carry qf's device-varying
    # type through the fori carry (no jax.lax.pvary — deprecated)
    m = qf[..., :1] * 0.0 + NEG_INF          # [b, block, h, 1]
    l = qf[..., :1] * 0.0
    acc = qf * 0.0
    q_ids = idx * block + jnp.arange(block)

    def step(i, carry):
        m, l, acc, k_blk, v_blk = carry
        src = (idx - i) % sp  # which sequence block this KV shard holds now
        # scores for this block: [b, block_q, h, block_k]
        qg = qf.reshape(b, block, hkv, g, d)
        s = jnp.einsum("bqkgd,bskd->bqkgs", qg, k_blk.astype(jnp.float32))
        s = s.reshape(b, block, h, block) * (d ** -0.5)
        if causal:
            k_ids = src * block + jnp.arange(block)
            allowed = k_ids[None, None, None, :] <= q_ids[None, :, None, None]
            s = jnp.where(allowed, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pg = p.reshape(b, block, hkv, g, block)
        upd = jnp.einsum("bqkgs,bskd->bqkgd", pg, v_blk.astype(jnp.float32))
        acc_new = acc * alpha + upd.reshape(b, block, h, d)
        # rotate KV to the next device
        k_nxt = jax.lax.ppermute(k_blk, axis, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis, perm)
        return m_new, l_new, acc_new, k_nxt, v_nxt

    m, l, acc, _, _ = jax.lax.fori_loop(0, sp, step, (m, l, acc, k, v))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ulysses_attention(q, k, v, mesh: Mesh, axis: str = "model",
                      causal: bool = False) -> jnp.ndarray:
    """q [B, T, H, D], k/v [B, T, Hkv, D] sharded on T over `axis` -> same sharding out.

    Standalone wrapper: opens its own shard_map. Requires H % sp == 0 (Hkv is expanded
    if it does not divide, see ulysses_attention_local).
    """
    spec = P(None, axis, None, None)
    return jax.shard_map(
        lambda q, k, v: ulysses_attention_local(q, k, v, axis, causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)(q, k, v)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "model",
                   causal: bool = False, impl: str = "flash") -> jnp.ndarray:
    """Ring attention with ppermute KV rotation and online softmax.

    q [B, T, H, D], k/v [B, T, Hkv, D] sharded on T over `axis`. Exact == full attention.
    Standalone wrapper: opens its own shard_map. impl: see ring_attention_local.
    """
    spec = P(None, axis, None, None)
    # check_vma=False for the flash path: interpret-mode pallas_call inside
    # lax.switch trips shard_map's varying-mesh-axes checker (jax suggests this
    # exact workaround); numerics are unchanged (exactness tests cover both impls)
    return jax.shard_map(
        lambda q, k, v: ring_attention_local(q, k, v, axis, causal=causal, impl=impl),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=(impl != "flash"))(q, k, v)


def shard_windows(mels: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Encoder-window parallelism (SURVEY.md §2.9 'first-class' row): place the window
    axis of [num_windows, frames, n_mels] across the whole mesh; encoder forward then runs
    window-data-parallel and XLA all-gathers the prefix embeddings where needed."""
    return jax.device_put(mels, NamedSharding(mesh, P(("data", "fsdp", "model"))))
