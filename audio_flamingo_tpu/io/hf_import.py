"""HF checkpoint -> pytree parameter import (table-driven name mapping).

Maps HuggingFace state-dict names (torch layout: Linear.weight is [out, in],
Conv1d.weight is [out, in, k]) onto our scan-stacked pytrees. Used both by golden tests
(state dict straight from a torch module) and by the safetensors checkpoint importer
(io/safetensors.py) for the released "-hf" checkpoints (SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from audio_flamingo_tpu.config import OPTConfig, Qwen2Config, WhisperEncoderConfig


def _t(x) -> np.ndarray:  # torch Linear [out,in] -> ours [in,out]
    return np.ascontiguousarray(np.asarray(x).T)


def _stack(layer_dicts: list[dict]) -> dict:
    import jax

    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layer_dicts)


def import_whisper_encoder(sd: dict, cfg: WhisperEncoderConfig, prefix: str = "") -> dict:
    """sd: flat name->array dict of an [hf] WhisperEncoder. prefix e.g. 'audio_tower.'."""
    g = lambda n: np.asarray(sd[prefix + n])
    layers = []
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        layers.append({
            "ln1_w": g(p + "self_attn_layer_norm.weight"),
            "ln1_b": g(p + "self_attn_layer_norm.bias"),
            "q": {"w": _t(g(p + "self_attn.q_proj.weight")), "b": g(p + "self_attn.q_proj.bias")},
            "k": {"w": _t(g(p + "self_attn.k_proj.weight"))},
            "v": {"w": _t(g(p + "self_attn.v_proj.weight")), "b": g(p + "self_attn.v_proj.bias")},
            "o": {"w": _t(g(p + "self_attn.out_proj.weight")), "b": g(p + "self_attn.out_proj.bias")},
            "ln2_w": g(p + "final_layer_norm.weight"),
            "ln2_b": g(p + "final_layer_norm.bias"),
            "fc1": {"w": _t(g(p + "fc1.weight")), "b": g(p + "fc1.bias")},
            "fc2": {"w": _t(g(p + "fc2.weight")), "b": g(p + "fc2.bias")},
        })
    return {
        "conv1_w": np.asarray(g("conv1.weight")).transpose(2, 1, 0),  # [out,in,k]->[k,in,out]
        "conv1_b": g("conv1.bias"),
        "conv2_w": np.asarray(g("conv2.weight")).transpose(2, 1, 0),
        "conv2_b": g("conv2.bias"),
        "pos": g("embed_positions.weight"),
        "layers": _stack(layers),
        "ln_post_w": g("layer_norm.weight"),
        "ln_post_b": g("layer_norm.bias"),
    }


def import_qwen2(sd: dict, cfg: Qwen2Config, prefix: str = "") -> dict:
    """sd: flat dict of an [hf] Qwen2ForCausalLM (or Qwen2Model with prefix='model.')."""
    g = lambda n: np.asarray(sd[prefix + n])
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        lay = {
            "ln1_w": g(p + "input_layernorm.weight"),
            "q": {"w": _t(g(p + "self_attn.q_proj.weight"))},
            "k": {"w": _t(g(p + "self_attn.k_proj.weight"))},
            "v": {"w": _t(g(p + "self_attn.v_proj.weight"))},
            "o": {"w": _t(g(p + "self_attn.o_proj.weight"))},
            "ln2_w": g(p + "post_attention_layernorm.weight"),
            "mlp": {"gate": _t(g(p + "mlp.gate_proj.weight")),
                    "up": _t(g(p + "mlp.up_proj.weight")),
                    "down": _t(g(p + "mlp.down_proj.weight"))},
        }
        if cfg.attention_bias:
            for name in ("q", "k", "v"):
                lay[name]["b"] = g(p + f"self_attn.{name}_proj.bias")
        layers.append(lay)
    params = {
        "embed": g("model.embed_tokens.weight"),
        "layers": _stack(layers),
        "ln_f_w": g("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _t(g("lm_head.weight"))
    return params


def import_qwen2_audio(sd: dict, cfg) -> dict:
    """AF3-family state dict -> params pytree, tolerant of naming variants.

    Recognized layouts (SURVEY.md §5 checkpoint row):
    - qwen2_audio style: audio_tower.* / multi_modal_projector.linear.* / language_model.*
    - llava/VILA style:  model.audio_tower.* (or *.audio_encoder.*) /
      model.mm_projector.{0,2}.* or mm_projector.fc1/fc2 (2-layer MLP adaptor) /
      model.layers.* + lm_head (LM at top level)
    """
    # normalize an optional global "model." wrapper when the inner names are themselves
    # prefixed (llava keeps model.layers for the LM, so only strip for tower/projector)
    def find_prefix(candidates, probe):
        for c in candidates:
            if any(k.startswith(c + probe) for k in sd):
                return c
        return None

    tower_prefix = find_prefix(["audio_tower.", "model.audio_tower.",
                                "model.sound_tower.", "audio_encoder.",
                                "model.audio_encoder."], "conv1.weight")
    if tower_prefix is None:
        raise KeyError("no audio tower found in state dict")

    # adaptor: single linear (qwen2_audio) or 2-layer MLP (llava mm_projector)
    adaptor = None
    for base in ("multi_modal_projector.linear", "model.multi_modal_projector.linear"):
        if base + ".weight" in sd:
            adaptor = {"fc1": {"w": _t(np.asarray(sd[base + ".weight"])),
                               "b": np.asarray(sd[base + ".bias"])}}
            break
    if adaptor is None:
        for b1, b2 in (("mm_projector.0", "mm_projector.2"),
                       ("model.mm_projector.0", "model.mm_projector.2"),
                       ("mm_projector.fc1", "mm_projector.fc2"),
                       ("model.mm_projector.fc1", "model.mm_projector.fc2")):
            if b1 + ".weight" in sd:
                adaptor = {"fc1": {"w": _t(np.asarray(sd[b1 + ".weight"])),
                                   "b": np.asarray(sd[b1 + ".bias"])},
                           "fc2": {"w": _t(np.asarray(sd[b2 + ".weight"])),
                                   "b": np.asarray(sd[b2 + ".bias"])}}
                break
    if adaptor is None:
        raise KeyError("no audio adaptor/projector found in state dict")

    if any(k.startswith("language_model.") for k in sd):
        lm_sd = {k[len("language_model."):]: v for k, v in sd.items()
                 if k.startswith("language_model.")}
    else:
        lm_sd = sd  # llava keeps model.layers.* + lm_head.* at top level
    return {
        "encoder": import_whisper_encoder(sd, cfg.encoder, prefix=tower_prefix),
        "adaptor": adaptor,
        "lm": import_qwen2(lm_sd, cfg.lm),
    }


def _bn_import(sd, prefix):
    return {"mean": np.asarray(sd[prefix + "running_mean"]),
            "var": np.asarray(sd[prefix + "running_var"]),
            "w": np.asarray(sd[prefix + "weight"]),
            "b": np.asarray(sd[prefix + "bias"])}


def import_clap_audio(sd: dict, cfg, prefix: str = "audio_model.audio_encoder.") -> dict:
    """[hf] ClapModel (audio branch) state dict -> models/clap.py pytree.

    Conv2d [out,in,kh,kw] -> HWIO; Linear [out,in] -> [in,out]; 1x1 convs in the AFF block
    -> plain linears.
    """
    g = lambda n: np.asarray(sd[prefix + n])

    def conv_hwio(name):
        return np.asarray(g(name)).transpose(2, 3, 1, 0)

    def lin(name, bias=True):
        p = {"w": _t(g(name + ".weight"))}
        if bias:
            p["b"] = g(name + ".bias")
        return p

    def conv1x1_as_lin(name):
        w = np.asarray(g(name + ".weight"))[:, :, 0, 0]  # [out,in]
        return {"w": np.ascontiguousarray(w.T), "b": g(name + ".bias")}

    params: dict = {
        "batch_norm": _bn_import(sd, prefix + "batch_norm."),
        "patch_embed": {
            "proj_w": conv_hwio("patch_embed.proj.weight"),
            "proj_b": g("patch_embed.proj.bias"),
            "norm_w": g("patch_embed.norm.weight"),
            "norm_b": g("patch_embed.norm.bias"),
        },
        "stages": [],
        "norm_w": g("norm.weight"), "norm_b": g("norm.bias"),
    }
    if cfg.enable_fusion:
        pe = params["patch_embed"]
        pe["mel_conv_w"] = conv_hwio("patch_embed.mel_conv2d.weight")
        pe["mel_conv_b"] = g("patch_embed.mel_conv2d.bias")
        pe["aff"] = {
            "local": {"c1": conv1x1_as_lin("patch_embed.fusion_model.local_att.0"),
                      "bn1": _bn_import(sd, prefix + "patch_embed.fusion_model.local_att.1."),
                      "c2": conv1x1_as_lin("patch_embed.fusion_model.local_att.3"),
                      "bn2": _bn_import(sd, prefix + "patch_embed.fusion_model.local_att.4.")},
            "global": {"c1": conv1x1_as_lin("patch_embed.fusion_model.global_att.1"),
                       "bn1": _bn_import(sd, prefix + "patch_embed.fusion_model.global_att.2."),
                       "c2": conv1x1_as_lin("patch_embed.fusion_model.global_att.4"),
                       "bn2": _bn_import(sd, prefix + "patch_embed.fusion_model.global_att.5.")},
        }
    for i, depth in enumerate(cfg.depths):
        blocks = []
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}."
            blocks.append({
                "ln1_w": g(p + "layernorm_before.weight"),
                "ln1_b": g(p + "layernorm_before.bias"),
                "q": lin(p + "attention.self.query"),
                "k": lin(p + "attention.self.key"),
                "v": lin(p + "attention.self.value"),
                "o": lin(p + "attention.output.dense"),
                "bias_table": g(p + "attention.self.relative_position_bias_table"),
                "ln2_w": g(p + "layernorm_after.weight"),
                "ln2_b": g(p + "layernorm_after.bias"),
                "fc1": lin(p + "intermediate.dense"),
                "fc2": lin(p + "output.dense"),
            })
        stage = {"blocks": blocks}
        if i < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm_w": g(f"layers.{i}.downsample.norm.weight"),
                "norm_b": g(f"layers.{i}.downsample.norm.bias"),
                "reduction": {"w": _t(g(f"layers.{i}.downsample.reduction.weight"))},
            }
        params["stages"].append(stage)
    # projection lives on ClapModel as audio_projection.*
    params["projection"] = {
        "fc1": {"w": _t(np.asarray(sd["audio_projection.linear1.weight"])),
                "b": np.asarray(sd["audio_projection.linear1.bias"])},
        "fc2": {"w": _t(np.asarray(sd["audio_projection.linear2.weight"])),
                "b": np.asarray(sd["audio_projection.linear2.bias"])},
    }
    return params


def import_clap_text(sd: dict, cfg, prefix: str = "text_model.") -> dict:
    """[hf] ClapTextModel (+ClapModel.text_projection) -> models/clap_text.py pytree."""
    g = lambda n: np.asarray(sd[prefix + n])
    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        layers.append({
            "q": {"w": _t(g(p + "attention.self.query.weight")),
                  "b": g(p + "attention.self.query.bias")},
            "k": {"w": _t(g(p + "attention.self.key.weight")),
                  "b": g(p + "attention.self.key.bias")},
            "v": {"w": _t(g(p + "attention.self.value.weight")),
                  "b": g(p + "attention.self.value.bias")},
            "o": {"w": _t(g(p + "attention.output.dense.weight")),
                  "b": g(p + "attention.output.dense.bias")},
            "ln_attn_w": g(p + "attention.output.LayerNorm.weight"),
            "ln_attn_b": g(p + "attention.output.LayerNorm.bias"),
            "fc1": {"w": _t(g(p + "intermediate.dense.weight")),
                    "b": g(p + "intermediate.dense.bias")},
            "fc2": {"w": _t(g(p + "output.dense.weight")),
                    "b": g(p + "output.dense.bias")},
            "ln_out_w": g(p + "output.LayerNorm.weight"),
            "ln_out_b": g(p + "output.LayerNorm.bias"),
        })
    params = {
        "word_emb": g("embeddings.word_embeddings.weight"),
        "pos_emb": g("embeddings.position_embeddings.weight"),
        "type_emb": g("embeddings.token_type_embeddings.weight"),
        "ln_emb_w": g("embeddings.LayerNorm.weight"),
        "ln_emb_b": g("embeddings.LayerNorm.bias"),
        "layers": _stack(layers),
        "pooler": {"w": _t(g("pooler.dense.weight")), "b": g("pooler.dense.bias")},
    }
    if "text_projection.linear1.weight" in sd:
        params["projection"] = {
            "fc1": {"w": _t(np.asarray(sd["text_projection.linear1.weight"])),
                    "b": np.asarray(sd["text_projection.linear1.bias"])},
            "fc2": {"w": _t(np.asarray(sd["text_projection.linear2.weight"])),
                    "b": np.asarray(sd["text_projection.linear2.bias"])},
        }
    return params


def import_opt(sd: dict, cfg: OPTConfig, prefix: str = "") -> dict:
    """sd: flat dict of an [hf] OPTForCausalLM. See models/opt.py for the pytree layout."""
    g = lambda n: np.asarray(sd[prefix + n])
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.decoder.layers.{i}."
        layers.append({
            "ln1_w": g(p + "self_attn_layer_norm.weight"),
            "ln1_b": g(p + "self_attn_layer_norm.bias"),
            "q": {"w": _t(g(p + "self_attn.q_proj.weight")), "b": g(p + "self_attn.q_proj.bias")},
            "k": {"w": _t(g(p + "self_attn.k_proj.weight")), "b": g(p + "self_attn.k_proj.bias")},
            "v": {"w": _t(g(p + "self_attn.v_proj.weight")), "b": g(p + "self_attn.v_proj.bias")},
            "o": {"w": _t(g(p + "self_attn.out_proj.weight")), "b": g(p + "self_attn.out_proj.bias")},
            "ln2_w": g(p + "final_layer_norm.weight"),
            "ln2_b": g(p + "final_layer_norm.bias"),
            "fc1": {"w": _t(g(p + "fc1.weight")), "b": g(p + "fc1.bias")},
            "fc2": {"w": _t(g(p + "fc2.weight")), "b": g(p + "fc2.bias")},
        })
    params = {
        "embed": g("model.decoder.embed_tokens.weight"),
        "pos_embed": g("model.decoder.embed_positions.weight"),
        "layers": _stack(layers),
    }
    if "model.decoder.final_layer_norm.weight" in sd:
        params["ln_f_w"] = g("model.decoder.final_layer_norm.weight")
        params["ln_f_b"] = g("model.decoder.final_layer_norm.bias")
    if "model.decoder.project_in.weight" in sd:
        params["project_in"] = _t(g("model.decoder.project_in.weight"))
        params["project_out"] = _t(g("model.decoder.project_out.weight"))
    return params
