"""End-to-end example: wav -> tokens -> wav (the spt3_model_example /
whisper_encoder_decoder.__main__ equivalent).

With no checkpoints supplied the models run with random weights — useful
as an API/pipeline smoke test; pass --*_ckpt to decode real audio.

  python examples/reconstruct.py --input in.wav --output out.wav \
      [--prompt_wav speaker.wav] [--streaming]
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moss_speech_decoder_cosy_tpu.bin.inference import main  # noqa: E402

if __name__ == "__main__":
    main()
