"""Training-stage curriculum: per-stage freeze masks.

Reference: static/af3_main_diagram-1.png top strip (AF-W / Adapt. / LLM each frozen or hot
per stage) and static/MF-architecture.png (SURVEY.md §2.0):

  AF3: 1 pre-train (adaptor hot) -> 2 encoder tuning (encoder+adaptor hot) ->
       3 full fine-tune (all hot) -> 3.5 context extension & thinking (encoder frozen) ->
       4 chat & voice.
  MF:  full FT -> context extension -> reasoning cold-start -> GRPO.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax


@dataclass(frozen=True)
class Stage:
    name: str
    train_encoder: bool
    train_adaptor: bool
    train_lm: bool
    lr: float = 1e-4
    description: str = ""


AF3_STAGES: dict[str, Stage] = {
    "1_pretrain": Stage("1_pretrain", False, True, False, lr=1e-3,
                        description="alignment pre-training: adaptor hot, encoder+LLM frozen"),
    "2_encoder_tuning": Stage("2_encoder_tuning", True, True, False, lr=2e-5,
                              description="AF-Whisper + adaptor hot"),
    "3_full_ft": Stage("3_full_ft", True, True, True, lr=1e-5,
                       description="full fine-tune, all hot"),
    "3.5_context_think": Stage("3.5_context_think", False, True, True, lr=1e-5,
                               description="context extension + thinking, encoder frozen"),
    "4_chat_voice": Stage("4_chat_voice", False, True, True, lr=1e-5,
                          description="chat & voice-to-voice"),
}


MF_STAGES: dict[str, Stage] = {
    # Music Flamingo pipeline (static/MF-architecture.png): AF3 -> full FT w/ MF-Skills +
    # context extension -> reasoning cold-start w/ MF-Think -> GRPO reasoning scaling
    "mf_1_full_ft": Stage("mf_1_full_ft", True, True, True, lr=1e-5,
                          description="full fine-tune on MF-Skills + context extension"),
    "mf_2_cold_start": Stage("mf_2_cold_start", False, True, True, lr=5e-6,
                             description="reasoning cold-start on MF-Think traces"),
    "mf_3_grpo": Stage("mf_3_grpo", False, False, True, lr=1e-6,
                       description="GRPO reasoning scaling (train/grpo.py)"),
}


def trainable_mask(params: dict, stage: Stage):
    """Pytree of bools: True where the leaf receives gradients this stage."""
    flags = {"encoder": stage.train_encoder, "adaptor": stage.train_adaptor,
             "lm": stage.train_lm}

    def fn(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return flags.get(top, True)

    return jax.tree_util.tree_map_with_path(fn, params)
