from audio_flamingo_tpu.serve.demo import DemoServer  # noqa: F401
