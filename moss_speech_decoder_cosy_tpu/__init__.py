"""moss_speech_decoder_cosy_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
MOSS-Speech / GLM-4-Voice speech-token decoder stack (CosyVoice flow decoder +
HiFT vocoder + WhisperVQ tokenizer).

This is a from-scratch TPU-first framework with the capabilities of the
reference repo ``alpacaking/MOSS-Speech-decoder-cosy`` (see SURVEY.md at the
repo root).  It is NOT a port: the compute path is pure JAX (static shapes,
``lax.scan`` ODE loops, feature-last layouts for the MXU), streaming state is
explicit pytrees, and parallelism is expressed with ``jax.sharding`` meshes.

Layout
------
- ``ops``       low-level numerics: masks, activations, STFT/iSTFT, convs,
                attention, positional embeddings.
- ``models``    the neural nets: ``flow`` (token → mel conditional flow
                matching) and ``hift`` (mel → waveform HiFTNet vocoder).
- ``tokenizer`` WhisperVQ speech tokenizer (wav → discrete tokens).
- ``pipeline``  session orchestration: token2wav offline + chunked streaming.
- ``training``  CFM/GAN losses, optimizers, data-parallel train step.
- ``parallel``  mesh / sharding helpers.
- ``utils``     configs, checkpoint IO, seeds.
"""

__version__ = "0.1.0"
