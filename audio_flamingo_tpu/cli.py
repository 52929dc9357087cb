"""Command-line interface: infer / chat / eval / bench.

Parity with the reference's per-branch inference scripts + chat loop (SURVEY.md §1 L6).
`--random-tiny` runs a random-weight micro-AF3 for smoke tests when no checkpoint is
available; `--model` points at an HF-layout checkpoint directory.
"""

from __future__ import annotations

import argparse
import sys



def _build_model(args):
    import jax.numpy as jnp

    from audio_flamingo_tpu.api import AudioFlamingo, load, load_draft

    quant = getattr(args, "quantize", "none")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.model:
        model = load(args.model, compute_dtype=dtype,
                     quantize_lm={"none": False, "int8": "int8",
                                  "int4": "int4"}[quant])
    else:
        model = AudioFlamingo.from_random(compute_dtype=dtype)
    if getattr(args, "draft", None):
        # speculative decoding: greedy batch-1 requests ride the draft/verify
        # loop (api docstring); the draft must share the target's tokenizer
        model.draft_params, model.draft_cfg = load_draft(
            args.draft, compute_dtype=dtype, quantize=quant != "none")
    return model


def cmd_infer(args):
    from audio_flamingo_tpu.audio.io import load_audio
    from audio_flamingo_tpu.ops.sampling import SamplingParams
    from audio_flamingo_tpu.utils.metrics import RequestTimer

    model = _build_model(args)
    wav = load_audio(args.audio, target_sr=16_000) if args.audio else None
    timer = RequestTimer(audio_seconds=len(wav) / 16_000 if wav is not None else 0.0)
    sampling = SamplingParams(greedy=not args.sample, temperature=args.temperature,
                              top_k=args.top_k, top_p=args.top_p)
    out = model.generate(sound=wav, prompt=args.prompt, max_new_tokens=args.max_new_tokens,
                         sampling=sampling, think=args.think)
    timer.token()
    stats = timer.finish()
    print(out)
    print(f"[{stats['total_s']:.2f}s"
          + (f", RTFx {stats['rtfx']:.0f}" if stats["rtfx"] else "") + "]",
          file=sys.stderr)


def cmd_chat(args):
    from audio_flamingo_tpu.audio.io import load_audio

    model = _build_model(args)
    print("multi-turn chat; ':audio <path>' attaches a clip to the next message; "
          "':reset' clears history; ctrl-d exits", file=sys.stderr)
    pending_audio = None
    while True:
        try:
            line = input("user> ").strip()
        except EOFError:
            return
        if not line:
            continue
        if line == ":reset":
            model.reset_chat()
            pending_audio = None
            continue
        if line.startswith(":audio "):
            pending_audio = load_audio(line.split(" ", 1)[1], target_sr=16_000)
            print(f"[attached {len(pending_audio)/16000:.1f}s of audio]", file=sys.stderr)
            continue
        out = model.generate(sound=pending_audio, prompt=line, chat=True,
                             max_new_tokens=args.max_new_tokens, think=args.think)
        pending_audio = None
        print(f"assistant> {out}")


def cmd_bench(args):
    import bench

    bench.main()


def cmd_train(args):
    import dataclasses

    import jax

    from audio_flamingo_tpu.models import af3
    from audio_flamingo_tpu.runtime.processor import AF3Processor, AUDIO_TOKEN
    from audio_flamingo_tpu.runtime.tokenizer import BBPETokenizer
    from audio_flamingo_tpu.train.config import load_train_config
    from audio_flamingo_tpu.train.data import BatchBuilder
    from audio_flamingo_tpu.train.loop import run

    model_cfg, run_cfg, make_sampler = load_train_config(args.config)
    if args.tokenizer:
        tok = BBPETokenizer.from_pretrained_dir(args.tokenizer)
    else:
        from audio_flamingo_tpu.runtime.tokenizer import train_bpe

        vocab, merges = train_bpe(["describe the audio"], min(400, model_cfg.lm.vocab_size))
        tok = BBPETokenizer(vocab, merges)
    model_cfg = dataclasses.replace(model_cfg,
                                    audio_token_id=tok.special_tokens[AUDIO_TOKEN])
    params = af3.init(jax.random.PRNGKey(args.seed), model_cfg)
    builder = BatchBuilder(processor=AF3Processor(tokenizer=tok, cfg=model_cfg))
    state, metrics = run(model_cfg, params, make_sampler(args.seed), builder, run_cfg)
    print(f"done: step {int(state.step)}, last loss {metrics.latest('loss')}")


def cmd_demo(args):
    from audio_flamingo_tpu.serve.demo import main as demo_main

    argv = ["--host", args.host, "--port", str(args.port)]
    if args.model:
        argv += ["--model", args.model]
    else:
        argv += ["--random-tiny"]
    if args.quantize_lm:
        argv += ["--quantize-lm"]
    demo_main(argv)


def main(argv=None):
    p = argparse.ArgumentParser(prog="audio_flamingo_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--model", default=None, help="HF-layout checkpoint dir")
        sp.add_argument("--bf16", action="store_true", default=True)
        sp.add_argument("--fp32", dest="bf16", action="store_false")
        sp.add_argument("--max-new-tokens", type=int, default=256)
        sp.add_argument("--think", action="store_true", help="AF-Think reasoning mode")
        sp.add_argument("--draft", default=None,
                        help="Qwen2 draft checkpoint dir (speculative decoding; "
                             "must share the target's tokenizer)")
        sp.add_argument("--quantize", choices=("none", "int8", "int4"),
                        default="none",
                        help="weight-only LM quantization (int8 fits 7B on one "
                             "chip; int4 = fastest decode, ops/quant4.py)")

    sp = sub.add_parser("infer", help="one-shot: wav in -> answer out")
    common(sp)
    sp.add_argument("--audio", default=None, help="path to a WAV file")
    sp.add_argument("--prompt", default="Describe the audio in detail.")
    sp.add_argument("--sample", action="store_true")
    sp.add_argument("--temperature", type=float, default=0.7)
    sp.add_argument("--top-k", type=int, default=50)
    sp.add_argument("--top-p", type=float, default=0.95)
    sp.set_defaults(fn=cmd_infer)

    sp = sub.add_parser("chat", help="interactive multi-turn chat")
    common(sp)
    sp.set_defaults(fn=cmd_chat)

    sp = sub.add_parser("bench", help="run the benchmark harness")
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("train", help="train from a YAML config (stage + mixture)")
    sp.add_argument("--config", required=True)
    sp.add_argument("--tokenizer", default=None, help="tokenizer dir (vocab/merges)")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("demo", help="interactive browser demo (audio upload + chat)")
    sp.add_argument("--model", default=None, help="HF-layout checkpoint dir")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=7860)
    sp.add_argument("--quantize-lm", action="store_true")
    sp.set_defaults(fn=cmd_demo)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
