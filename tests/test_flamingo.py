"""AF1/AF2 gated cross-attention tests: zero-init identity, media masking semantics,
OPT golden parity, safetensors roundtrip."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_flamingo_tpu.config import AF2Config, ClapAudioConfig, GatedXAttnConfig, OPTConfig, Qwen2Config
from audio_flamingo_tpu.models import flamingo, opt, qwen2
from audio_flamingo_tpu.ops import xattn as xattn_op

jax.config.update("jax_default_matmul_precision", "highest")

CFG = AF2Config(
    clap=ClapAudioConfig(),
    lm=Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64, num_layers=2,
                   num_heads=4, num_kv_heads=2, tie_word_embeddings=True),
    xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
    num_audio_transform_layers=2,
    audio_embed_dim=16,
)


def test_zero_init_gates_are_identity():
    """With zero-init alphas, AF2 logits == plain Qwen2 logits (xattn is a no-op)."""
    params = flamingo.init(jax.random.PRNGKey(0), CFG)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 96, (2, 7)))
    wins = jnp.asarray(np.random.default_rng(1).normal(size=(2, 1, 4, 16)), jnp.float32)
    with_audio = flamingo.logits(params, CFG, ids, wins)
    plain = qwen2.logits_from_ids(params["lm"], CFG.lm, ids)
    np.testing.assert_allclose(np.asarray(with_audio), np.asarray(plain), atol=1e-5)


def test_nonzero_gates_use_audio():
    params = flamingo.init(jax.random.PRNGKey(0), CFG)
    params["xattn"]["alpha_xattn"] = jnp.ones_like(params["xattn"]["alpha_xattn"])
    ids = jnp.asarray([[1, 2, 3, 4]])
    rng = np.random.default_rng(2)
    wins_a = jnp.asarray(rng.normal(size=(1, 1, 4, 16)), jnp.float32)
    wins_b = jnp.asarray(rng.normal(size=(1, 1, 4, 16)), jnp.float32)
    la = flamingo.logits(params, CFG, ids, wins_a)
    lb = flamingo.logits(params, CFG, ids, wins_b)
    assert float(jnp.abs(la - lb).max()) > 1e-4


def test_media_mask_semantics():
    """mode='last': text after media i attends only media i; 'all_previous': <= i."""
    idx = jnp.asarray([[0, 1, 1, 2, 2]])  # tokens: pre-media, after m0, after m0, after m1...
    m_last = xattn_op.media_mask(idx, n_media=2, tokens_per_media=3, mode="last")
    m_all = xattn_op.media_mask(idx, n_media=2, tokens_per_media=3, mode="all_previous")
    # token 0: nothing attendable
    assert not bool(m_last[0, 0, 0].any()) and not bool(m_all[0, 0, 0].any())
    # token 1 (after media 0): attends media 0 only in both modes
    np.testing.assert_array_equal(np.asarray(m_last[0, 0, 1]), [True] * 3 + [False] * 3)
    # token 3 (after media 1): 'last' -> only media 1; 'all_previous' -> both
    np.testing.assert_array_equal(np.asarray(m_last[0, 0, 3]), [False] * 3 + [True] * 3)
    np.testing.assert_array_equal(np.asarray(m_all[0, 0, 3]), [True] * 6)


def test_icl_interleaving_isolates_audio():
    """Few-shot: answer tokens for example k must be unaffected by swapping OTHER audio."""
    params = flamingo.init(jax.random.PRNGKey(0), CFG)
    params["xattn"]["alpha_xattn"] = jnp.ones_like(params["xattn"]["alpha_xattn"])
    rng = np.random.default_rng(3)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6]])
    media_idx = jnp.asarray([[1, 1, 1, 2, 2, 2]])  # first 3 tokens after media0, rest after media1
    wins = jnp.asarray(rng.normal(size=(1, 2, 2, 16)), jnp.float32)  # 2 media x 2 windows
    wins_swapped = wins.at[:, 1].set(jnp.asarray(rng.normal(size=(1, 2, 16)), jnp.float32))
    l1 = flamingo.logits_with_media_mask(params, CFG, ids, wins, media_idx, n_media=2, mode="last")
    l2 = flamingo.logits_with_media_mask(params, CFG, ids, wins_swapped, media_idx, n_media=2, mode="last")
    # tokens 0-2 attend media 0 only -> FIRST token logits identical (causal LM: token 3+
    # mixes via self-attention once media-1-attending positions change)
    np.testing.assert_allclose(np.asarray(l1[0, :3]), np.asarray(l2[0, :3]), atol=1e-5)
    assert float(jnp.abs(l1[0, 3:] - l2[0, 3:]).max()) > 1e-5


def test_opt_matches_hf():
    from transformers.models.opt.configuration_opt import OPTConfig as HFOPTConfig
    from transformers.models.opt.modeling_opt import OPTForCausalLM

    cfg = OPTConfig(vocab_size=100, hidden_size=32, ffn_dim=64, num_layers=2, num_heads=4,
                    max_position_embeddings=64)
    hf_cfg = HFOPTConfig(vocab_size=100, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
                         num_attention_heads=4, max_position_embeddings=64,
                         do_layer_norm_before=True, dropout=0.0, word_embed_proj_dim=32)
    torch.manual_seed(0)
    hf = OPTForCausalLM(hf_cfg).eval()
    from audio_flamingo_tpu.io.hf_import import import_opt

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = import_opt(sd, cfg)
    ids = np.random.default_rng(0).integers(0, 100, (2, 9))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(opt.logits_from_ids(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_opt_cache_consistency():
    cfg = OPTConfig(vocab_size=50, hidden_size=16, ffn_dim=32, num_layers=2, num_heads=2,
                    max_position_embeddings=32)
    params = opt.init(jax.random.PRNGKey(1), cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 50, (1, 8)))
    full = opt.logits_from_ids(params, cfg, ids)
    cache = opt.init_cache(cfg, 1, 16, dtype=jnp.float32)
    x = opt.embed(params, cfg, ids[:, :5])
    h, cache = opt.forward(params, cfg, x, jnp.arange(5)[None], cache=cache)
    np.testing.assert_allclose(np.asarray(opt.unembed(params, cfg, h)),
                               np.asarray(full[:, :5]), atol=1e-4, rtol=1e-4)
    for t in range(5, 8):
        x = opt.embed(params, cfg, ids[:, t: t + 1])
        h, cache = opt.forward(params, cfg, x, jnp.array([[t]]), cache=cache)
        np.testing.assert_allclose(np.asarray(opt.unembed(params, cfg, h)[:, 0]),
                                   np.asarray(full[:, t]), atol=1e-4, rtol=1e-4)


def test_safetensors_roundtrip(tmp_path):
    from audio_flamingo_tpu.io.safetensors import load_safetensors, save_safetensors

    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.normal(size=(3, 4)).astype(np.float32),
        "b.bias": rng.normal(size=(7,)).astype(np.float16),
        "c.ids": np.arange(5, dtype=np.int64),
    }
    path = str(tmp_path / "x.safetensors")
    save_safetensors(path, tensors, metadata={"format": "pt"})
    loaded = load_safetensors(path)
    for k, v in tensors.items():
        np.testing.assert_array_equal(loaded[k], v)


def test_safetensors_matches_hf_torch_format(tmp_path):
    """Cross-check our writer/reader against torch's tensor bytes via HF conventions."""
    from audio_flamingo_tpu.io.safetensors import SafetensorsFile, save_safetensors

    t = torch.arange(12, dtype=torch.bfloat16).reshape(3, 4) * 1.5
    raw = t.view(torch.uint16).numpy()
    path = str(tmp_path / "bf16.safetensors")
    save_safetensors(path, {"w": raw})
    f = SafetensorsFile(path)
    out = f.tensor("w")  # upcast to f32
    np.testing.assert_allclose(out, t.float().numpy())


def test_af2_generate_matches_full_forward_greedy():
    """Cache+xattn decode path: greedy tokens == argmax chain of the no-cache forward."""
    params = flamingo.init(jax.random.PRNGKey(2), CFG)
    params["xattn"]["alpha_xattn"] = jnp.full_like(params["xattn"]["alpha_xattn"], 0.5)
    rng = np.random.default_rng(5)
    ids = jnp.asarray([[1, 2, 3]])
    wins = jnp.asarray(rng.normal(size=(1, 1, 4, 16)), jnp.float32)
    tokens, lengths = flamingo.generate(params, CFG, ids, wins, max_new_tokens=5,
                                        eos_token_id=-2)
    toks = np.asarray(tokens)[0]
    # teacher-force through the no-cache forward
    seq = np.asarray(ids)[0].tolist()
    for i in range(5):
        full = flamingo.logits(params, CFG, jnp.asarray([seq]), wins)
        nxt = int(jnp.argmax(full[0, -1]))
        assert nxt == int(toks[i]), (i, nxt, int(toks[i]))
        seq.append(nxt)


def test_af1_opt_xattn_generate():
    """AF1 composition: OPT decoder + gated xattn; zero-gates == plain OPT; generate runs."""
    from audio_flamingo_tpu.config import AF1Config, OPTConfig

    cfg = AF1Config.make(
        lm=OPTConfig(vocab_size=96, hidden_size=32, ffn_dim=64, num_layers=2, num_heads=4,
                     max_position_embeddings=64),
        xattn=GatedXAttnConfig(cross_every_n_layers=1, num_heads=4, ffn_mult=2),
        audio_embed_dim=16,
    )
    params = flamingo.init(jax.random.PRNGKey(3), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 96, (1, 6)))
    wins = jnp.asarray(np.random.default_rng(1).normal(size=(1, 1, 3, 16)), jnp.float32)
    with_audio = flamingo.logits(params, cfg, ids, wins)
    plain = opt.logits_from_ids(params["lm"], cfg.lm, ids)
    np.testing.assert_allclose(np.asarray(with_audio), np.asarray(plain), atol=1e-5)

    # nonzero gates + greedy generate == teacher-forced argmax chain
    params["xattn"]["alpha_xattn"] = jnp.full_like(params["xattn"]["alpha_xattn"], 0.5)
    tokens, lengths = flamingo.generate(params, cfg, ids, wins, max_new_tokens=4,
                                        eos_token_id=-2)
    seq = np.asarray(ids)[0].tolist()
    for i in range(4):
        full = flamingo.logits(params, cfg, jnp.asarray([seq]), wins)
        nxt = int(jnp.argmax(full[0, -1]))
        assert nxt == int(np.asarray(tokens)[0][i])
        seq.append(nxt)


def test_af1_icl_generation_media_masked():
    """Few-shot ICL generation: with 'last' masking, only the final clip influences the
    generated tokens (swapping earlier shots' audio leaves output unchanged WHEN the
    prompt segments tied to them are also unchanged... here we check the decode side:
    swapping the FINAL clip changes output; swapping an EARLIER clip with identical
    prompt masking changes only via prompt self-attn, so we verify end-to-end masking by
    comparing against explicit full-forward media-masked logits)."""
    params = flamingo.init(jax.random.PRNGKey(4), CFG)
    params["xattn"]["alpha_xattn"] = jnp.full_like(params["xattn"]["alpha_xattn"], 0.5)
    rng = np.random.default_rng(6)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6]])
    media_idx = jnp.asarray([[1, 1, 1, 2, 2, 2]])
    wins = jnp.asarray(rng.normal(size=(1, 2, 2, 16)), jnp.float32)

    tokens, _ = flamingo.generate(params, CFG, ids, wins, max_new_tokens=4,
                                  eos_token_id=-2, text_media_idx=media_idx,
                                  media_mode="last")
    # teacher-forced reference with media masking: next token must match position by
    # position (generated tokens get ordinal n_media = 2)
    seq = np.asarray(ids)[0].tolist()
    idx = np.asarray(media_idx)[0].tolist()
    for i in range(4):
        full = flamingo.logits_with_media_mask(params, CFG, jnp.asarray([seq]), wins,
                                               jnp.asarray([idx]), n_media=2, mode="last")
        nxt = int(jnp.argmax(full[0, -1]))
        assert nxt == int(np.asarray(tokens)[0][i]), (i, nxt)
        seq.append(nxt)
        idx.append(2)
