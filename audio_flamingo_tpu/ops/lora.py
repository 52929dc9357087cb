"""LoRA / QLoRA adapters for the Qwen2 LM (parameter-efficient fine-tuning).

The reference lineage full-fine-tunes its stages (SURVEY.md §2.0); LoRA is the
industry-standard beyond-reference knob for adapting the 7B backbone on small
budgets — and the TPU-native fit is exact: adapters are tiny per-layer leaves
riding the SAME scan-stacked pytree, so the training step, remat, FSDP/TP
shardings and optimizer masks all apply unchanged.

Design (Hu et al., LoRA):
- each targeted linear dict gains `lora_a` [.., K, r] (gaussian / sqrt(r)),
  `lora_b` [.., r, N] (zeros — the adapter is an exact IDENTITY at init) and
  `lora_s` ([] f32 = alpha / r);
- models/qwen2._linear adds `(x @ a) @ b * s` after the base matmul, so every
  weight layout serves unmerged: bf16 `w`, int8 `w_q` (QLoRA: frozen
  quantized base + float adapters). The fused-w4 decode tree is a SERVING
  artifact and cannot carry adapters — merge first (`merge_lora`) or serve the
  int8/bf16 tree;
- `lora_mask` marks only adapter leaves trainable; train/train_step's
  freeze-mask optimizer does the rest (`make_optimizer(..., lora_only=True)`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ATTN_TARGETS = ("q", "k", "v", "o")
MLP_TARGETS = ("gate", "up", "down")
DEFAULT_TARGETS = ATTN_TARGETS + MLP_TARGETS


def _base_shape(p) -> tuple[int, int]:
    """Targeted linear (dict or plain array) -> (K, N) of its base weight."""
    if isinstance(p, dict):
        w = p.get("w", p.get("w_q"))
        assert w is not None, ("LoRA targets need a dense 'w' or int8 'w_q' "
                               "base (fused-w4 trees cannot carry adapters)")
        return w.shape[-2], w.shape[-1]
    return p.shape[-2], p.shape[-1]


def _with_lora(rng, p, rank: int, scale: float, lead: tuple):
    """Return p (as a dict) with lora_a/lora_b/lora_s leaves added."""
    k, n = _base_shape(p)
    out = dict(p) if isinstance(p, dict) else {"w": p}
    out["lora_a"] = (jax.random.normal(rng, (*lead, k, rank), jnp.float32)
                     / jnp.sqrt(rank))
    out["lora_b"] = jnp.zeros((*lead, rank, n), jnp.float32)
    # per-layer scale vector so the leaf rides the layer scan like a/b
    out["lora_s"] = jnp.full(lead or (), scale, jnp.float32)
    return out


def add_lora(rng: jax.Array, params: dict, *, rank: int = 8,
             alpha: float | None = None,
             targets: tuple = DEFAULT_TARGETS) -> dict:
    """Insert zero-init LoRA adapters into a Qwen2 LM pytree (or the `lm`
    subtree of an AF3 tree). The returned tree computes EXACTLY the same
    function as the input until lora_b moves off zero."""
    if "lm" in params:  # AF3-family tree: adapters on the LM backbone
        out = dict(params)
        out["lm"] = add_lora(rng, params["lm"], rank=rank, alpha=alpha,
                             targets=targets)
        return out
    scale = (alpha if alpha is not None else float(rank)) / rank
    layers = dict(params["layers"])
    lead = (layers["ln1_w"].shape[0],)            # stacked [L, ...]
    keys = jax.random.split(rng, len(DEFAULT_TARGETS))
    for i, name in enumerate(ATTN_TARGETS):
        if name in targets and name in layers:
            layers[name] = _with_lora(keys[i], layers[name], rank, scale, lead)
    if any(t in targets for t in MLP_TARGETS) and "mlp" in layers:
        mlp = dict(layers["mlp"])
        # models/qwen2.mlp_forward dispatches on mlp["gate"] being a dict and
        # then routes ALL THREE through _linear — wrap all of them
        for j, name in enumerate(MLP_TARGETS):
            p = mlp[name]
            if name in targets:
                mlp[name] = _with_lora(keys[4 + j], p, rank, scale, lead)
            elif not isinstance(p, dict):
                mlp[name] = {"w": p}
        layers["mlp"] = mlp
    out = dict(params)
    out["layers"] = layers
    return out


def lora_delta(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """(x @ a) @ b * s in f32 — the additive adapter term for one linear."""
    h = jax.lax.dot_general(x.astype(jnp.float32), p["lora_a"],
                            (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(h, p["lora_b"], (((h.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) * p["lora_s"]


def partition_lora(params: dict):
    """Split an adapter-carrying tree into (lora_leaves, base_leaves, rebuild).

    For QLoRA training the differentiable argument must be ONLY the adapter
    leaves: the frozen base may be int8 (non-differentiable dtype), and JAX's
    value_and_grad over the whole tree would reject it. rebuild(lora_leaves,
    base_leaves) reassembles the full tree; both leaf lists are pytrees meant
    to be passed as jit ARGUMENTS (never closed over — compile-constant
    ingestion of GB-scale trees hangs the remote compiler)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    lora_idx = [i for i, (path, _) in enumerate(flat)
                if getattr(path[-1], "key", "") in ("lora_a", "lora_b")]
    lora_set = set(lora_idx)
    lora_leaves = [leaf for i, (_, leaf) in enumerate(flat) if i in lora_set]
    base_leaves = [leaf for i, (_, leaf) in enumerate(flat) if i not in lora_set]

    def rebuild(lora_vals, base_vals):
        it_l, it_b = iter(lora_vals), iter(base_vals)
        leaves = [next(it_l) if i in lora_set else next(it_b)
                  for i in range(len(flat))]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return lora_leaves, base_leaves, rebuild


def lora_mask(params: dict):
    """Pytree of bools: True ONLY on lora_a/lora_b leaves (lora_s is a fixed
    hyperparameter; base weights frozen)."""

    def fn(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        return name in ("lora_a", "lora_b")

    return jax.tree_util.tree_map_with_path(fn, params)


def save_lora(path: str, params: dict) -> None:
    """Write ONLY the adapter leaves (lora_a/lora_b/lora_s) to a safetensors
    file — the standard ship-the-adapter workflow (a rank-8 7B adapter is
    ~40 MB vs the 15 GB base)."""
    import numpy as np

    from audio_flamingo_tpu.io.safetensors import save_safetensors

    flat: dict = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [p.key for p in key_path if hasattr(p, "key")]
        if names and names[-1].startswith("lora_"):
            flat["/".join(names)] = np.asarray(leaf, np.float32)
    assert flat, "no adapter leaves found — call add_lora first"
    save_safetensors(path, flat, metadata={"format": "lora"})


def load_lora(path: str, params: dict) -> dict:
    """Insert saved adapters into a matching BASE tree (reverse of save_lora).

    The base may be bf16/f32 or int8-quantized (QLoRA serving); plain-array
    mlp entries are wrapped into {"w": ...} dicts exactly like add_lora so the
    dispatch in models/qwen2 routes them through _linear."""
    from audio_flamingo_tpu.io.safetensors import load_safetensors

    flat = load_safetensors(path)

    def insert(tree: dict, names: list, leaf) -> dict:
        out = dict(tree)
        head = names[0]
        if len(names) == 1:
            out[head] = jnp.asarray(leaf)
            return out
        child = out.get(head)
        if not isinstance(child, dict):
            child = {"w": child} if child is not None else {}
        out[head] = insert(child, names[1:], leaf)
        return out

    out = params
    touched_mlps = set()
    for name, arr in sorted(flat.items()):
        names = name.split("/")
        out = insert(out, names, arr)
        if "mlp" in names:
            touched_mlps.add(tuple(names[: names.index("mlp") + 1]))
    # mlp_forward routes ALL THREE entries through _linear once gate is a
    # dict — wrap any untouched plain-array siblings (add_lora contract)
    for mlp_path in touched_mlps:
        node = out
        for k in mlp_path[:-1]:
            node = node[k]
        mlp = dict(node[mlp_path[-1]])
        for k, v in mlp.items():
            if not isinstance(v, dict):
                mlp[k] = {"w": v}
        node[mlp_path[-1]] = mlp
    return out


def merge_lora(params: dict) -> dict:
    """Fold adapters into the dense base weights (w += a @ b * s) and strip the
    lora leaves — for export/serving (incl. re-quantization to int8/int4).
    Requires a FLOAT base ('w'); QLoRA trees must be re-materialized dense
    first (the int8 grid cannot absorb the delta exactly)."""

    def walk(node, name=None):
        if isinstance(node, dict):
            if "lora_a" in node:
                assert "w" in node, \
                    "merge_lora needs a dense float base; dequantize first"
                w = node["w"].astype(jnp.float32)
                delta = jnp.einsum("...kr,...rn->...kn",
                                   node["lora_a"].astype(jnp.float32),
                                   node["lora_b"].astype(jnp.float32))
                out = {k: v for k, v in node.items()
                       if k not in ("lora_a", "lora_b", "lora_s")}
                sc = node["lora_s"]
                sc = sc.reshape(sc.shape + (1, 1)) if sc.ndim else sc
                out["w"] = (w + delta * sc).astype(node["w"].dtype)
                # mlp entries are plain arrays in the base layout — the {"w"}
                # dict only existed to carry the adapters, so collapse it back;
                # attention dicts ({"w"[, "b"]}) keep their shape
                if name in MLP_TARGETS and set(out) == {"w"}:
                    return out["w"]
                return out
            if name in MLP_TARGETS and set(node) == {"w"}:
                return node["w"]            # wrapped-but-untargeted mlp entry
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)
