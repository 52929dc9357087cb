from audio_flamingo_tpu.cli import main

main()
