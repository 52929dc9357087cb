"""Export our AF3 params to an HF-compatible checkpoint (reverse of io/hf_import.py).

Writes qwen2_audio-style names (audio_tower.* / multi_modal_projector.* /
language_model.*) into a single model.safetensors + config.json + tokenizer files, so
models trained here load in the PyTorch ecosystem — roundtrip-tested through our own
importer and through [hf] Qwen2AudioForConditionalGeneration.load_state_dict.
"""

from __future__ import annotations

import json
import os

import numpy as np

from audio_flamingo_tpu.config import AF3Config


def _tt(x) -> np.ndarray:  # ours [in,out] -> torch Linear [out,in]
    return np.ascontiguousarray(np.asarray(x).T)


def export_af3_state_dict(params: dict, cfg: AF3Config) -> dict[str, np.ndarray]:
    """Params pytree -> flat HF-style state dict (numpy, f32)."""
    sd: dict[str, np.ndarray] = {}
    enc = params["encoder"]
    sd["audio_tower.conv1.weight"] = np.asarray(enc["conv1_w"]).transpose(2, 1, 0)
    sd["audio_tower.conv1.bias"] = np.asarray(enc["conv1_b"])
    sd["audio_tower.conv2.weight"] = np.asarray(enc["conv2_w"]).transpose(2, 1, 0)
    sd["audio_tower.conv2.bias"] = np.asarray(enc["conv2_b"])
    sd["audio_tower.embed_positions.weight"] = np.asarray(enc["pos"])
    for i in range(cfg.encoder.num_layers):
        lp = {k: (np.asarray(v) if not isinstance(v, dict)
                  else {k2: np.asarray(v2) for k2, v2 in v.items()})
              for k, v in ((kk, jtree_index(enc["layers"][kk], i))
                           for kk in enc["layers"])}
        p = f"audio_tower.layers.{i}."
        sd[p + "self_attn_layer_norm.weight"] = lp["ln1_w"]
        sd[p + "self_attn_layer_norm.bias"] = lp["ln1_b"]
        sd[p + "self_attn.q_proj.weight"] = _tt(lp["q"]["w"])
        sd[p + "self_attn.q_proj.bias"] = lp["q"]["b"]
        sd[p + "self_attn.k_proj.weight"] = _tt(lp["k"]["w"])
        sd[p + "self_attn.v_proj.weight"] = _tt(lp["v"]["w"])
        sd[p + "self_attn.v_proj.bias"] = lp["v"]["b"]
        sd[p + "self_attn.out_proj.weight"] = _tt(lp["o"]["w"])
        sd[p + "self_attn.out_proj.bias"] = lp["o"]["b"]
        sd[p + "final_layer_norm.weight"] = lp["ln2_w"]
        sd[p + "final_layer_norm.bias"] = lp["ln2_b"]
        sd[p + "fc1.weight"] = _tt(lp["fc1"]["w"])
        sd[p + "fc1.bias"] = lp["fc1"]["b"]
        sd[p + "fc2.weight"] = _tt(lp["fc2"]["w"])
        sd[p + "fc2.bias"] = lp["fc2"]["b"]
    sd["audio_tower.layer_norm.weight"] = np.asarray(enc["ln_post_w"])
    sd["audio_tower.layer_norm.bias"] = np.asarray(enc["ln_post_b"])

    ada = params["adaptor"]
    sd["multi_modal_projector.linear.weight"] = _tt(ada["fc1"]["w"])
    sd["multi_modal_projector.linear.bias"] = np.asarray(ada["fc1"]["b"])
    # NOTE: a 2-layer adaptor exports fc2 as mm_projector.2 (llava naming)
    if "fc2" in ada:
        sd["mm_projector.2.weight"] = _tt(ada["fc2"]["w"])
        sd["mm_projector.2.bias"] = np.asarray(ada["fc2"]["b"])

    lm = params["lm"]
    sd["language_model.model.embed_tokens.weight"] = np.asarray(lm["embed"])
    for i in range(cfg.lm.num_layers):
        p = f"language_model.model.layers.{i}."
        lay = jtree_layer(lm["layers"], i)
        sd[p + "input_layernorm.weight"] = lay["ln1_w"]
        for name in ("q", "k", "v"):
            sd[p + f"self_attn.{name}_proj.weight"] = _tt(lay[name]["w"])
            if "b" in lay[name]:
                sd[p + f"self_attn.{name}_proj.bias"] = lay[name]["b"]
        sd[p + "self_attn.o_proj.weight"] = _tt(lay["o"]["w"])
        sd[p + "post_attention_layernorm.weight"] = lay["ln2_w"]
        sd[p + "mlp.gate_proj.weight"] = _tt(lay["mlp"]["gate"])
        sd[p + "mlp.up_proj.weight"] = _tt(lay["mlp"]["up"])
        sd[p + "mlp.down_proj.weight"] = _tt(lay["mlp"]["down"])
    sd["language_model.model.norm.weight"] = np.asarray(lm["ln_f_w"])
    if "lm_head" in lm:
        sd["language_model.lm_head.weight"] = _tt(lm["lm_head"])
    else:
        sd["language_model.lm_head.weight"] = np.asarray(lm["embed"])
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def export_qwen2_state_dict(params: dict, cfg) -> dict[str, np.ndarray]:
    """Plain Qwen2ForCausalLM params pytree -> flat HF state dict (numpy f32).

    The reverse of io/hf_import.import_qwen2 — used to write speculative-DRAFT
    checkpoints (api.load_draft) and to export standalone LMs trained here."""
    sd: dict[str, np.ndarray] = {}
    sd["model.embed_tokens.weight"] = np.asarray(params["embed"])
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        lay = jtree_layer(params["layers"], i)
        sd[p + "input_layernorm.weight"] = lay["ln1_w"]
        for name in ("q", "k", "v"):
            sd[p + f"self_attn.{name}_proj.weight"] = _tt(lay[name]["w"])
            if "b" in lay[name]:
                sd[p + f"self_attn.{name}_proj.bias"] = lay[name]["b"]
        sd[p + "self_attn.o_proj.weight"] = _tt(lay["o"]["w"])
        sd[p + "post_attention_layernorm.weight"] = lay["ln2_w"]
        sd[p + "mlp.gate_proj.weight"] = _tt(lay["mlp"]["gate"])
        sd[p + "mlp.up_proj.weight"] = _tt(lay["mlp"]["up"])
        sd[p + "mlp.down_proj.weight"] = _tt(lay["mlp"]["down"])
    sd["model.norm.weight"] = np.asarray(params["ln_f_w"])
    if "lm_head" in params:
        sd["lm_head.weight"] = _tt(params["lm_head"])
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def save_qwen2_pretrained(path: str, params: dict, cfg) -> None:
    """Write a plain-Qwen2 HF-layout dir loadable by api.load_draft (and torch)."""
    from audio_flamingo_tpu.io.safetensors import save_safetensors

    os.makedirs(path, exist_ok=True)
    save_safetensors(os.path.join(path, "model.safetensors"),
                     export_qwen2_state_dict(params, cfg),
                     metadata={"format": "pt"})
    config = {
        "model_type": "qwen2",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "rope_theta": cfg.rope_theta,
        "tie_word_embeddings": cfg.tie_word_embeddings,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=1)


def jtree_index(node, i):
    import jax

    return jax.tree.map(lambda a: np.asarray(a[i]), node)


def jtree_layer(layers: dict, i: int) -> dict:
    return {k: jtree_index(v, i) for k, v in layers.items()}


def save_pretrained(path: str, params: dict, cfg: AF3Config,
                    tokenizer=None, *, dtype: str | None = None,
                    max_shard_bytes: int | None = None) -> None:
    """Write an HF-layout checkpoint dir loadable by api.load (and torch).

    dtype="bf16" casts float tensors to bfloat16 (the dtype the NVIDIA '-hf' releases
    ship, README.md:79-84). max_shard_bytes splits the weights across
    model-XXXXX-of-YYYYY.safetensors shards with a model.safetensors.index.json
    weight_map — the exact sharded layout of the released checkpoints.
    """
    from audio_flamingo_tpu.io.safetensors import save_safetensors

    os.makedirs(path, exist_ok=True)
    sd = export_af3_state_dict(params, cfg)
    if dtype == "bf16":
        import ml_dtypes

        sd = {k: (v.astype(ml_dtypes.bfloat16) if v.dtype.kind == "f" else v)
              for k, v in sd.items()}
    if max_shard_bytes is None:
        save_safetensors(os.path.join(path, "model.safetensors"), sd,
                         metadata={"format": "pt"})
    else:
        shards: list[dict] = [{}]
        sizes = [0]
        for k, v in sd.items():
            nb = v.nbytes
            if sizes[-1] and sizes[-1] + nb > max_shard_bytes:
                shards.append({})
                sizes.append(0)
            shards[-1][k] = v
            sizes[-1] += nb
        n = len(shards)
        weight_map: dict[str, str] = {}
        for i, shard in enumerate(shards):
            fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
            save_safetensors(os.path.join(path, fname), shard, metadata={"format": "pt"})
            for k in shard:
                weight_map[k] = fname
        index = {"metadata": {"total_size": int(sum(sizes))}, "weight_map": weight_map}
        with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
            json.dump(index, f, indent=1)
    config = {
        "model_type": "qwen2_audio",
        "audio_token_id": cfg.audio_token_id,
        "audio_config": {
            "num_mel_bins": cfg.encoder.num_mel_bins,
            "d_model": cfg.encoder.d_model,
            "encoder_layers": cfg.encoder.num_layers,
            "encoder_attention_heads": cfg.encoder.num_heads,
            "encoder_ffn_dim": cfg.encoder.ffn_dim,
            "max_source_positions": cfg.encoder.max_source_positions,
        },
        "text_config": {
            "vocab_size": cfg.lm.vocab_size,
            "hidden_size": cfg.lm.hidden_size,
            "intermediate_size": cfg.lm.intermediate_size,
            "num_hidden_layers": cfg.lm.num_layers,
            "num_attention_heads": cfg.lm.num_heads,
            "num_key_value_heads": cfg.lm.num_kv_heads,
            "rope_theta": cfg.lm.rope_theta,
            "tie_word_embeddings": cfg.lm.tie_word_embeddings,
        },
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=1)
    if tokenizer is not None:
        with open(os.path.join(path, "vocab.json"), "w") as f:
            json.dump(tokenizer.vocab, f)
        with open(os.path.join(path, "merges.txt"), "w") as f:
            f.write("#version: 0.2\n")
            for a, b in tokenizer.merges:
                f.write(f"{a} {b}\n")
