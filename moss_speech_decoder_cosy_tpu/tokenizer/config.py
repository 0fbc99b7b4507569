"""WhisperVQ tokenizer configuration.

Mirrors the knobs of the reference WhisperVQConfig
(speech_tokenizer/configuration_whisper.py:4-37) instantiated by
/root/reference/config.json (the GLM-4-Voice tokenizer): fully causal
attention + causal convs, avg-pool k4 and VQ after layer 16, vocab 16384.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class WhisperVQConfig:
    num_mel_bins: int = 128
    d_model: int = 1280
    attention_heads: int = 20
    ffn_dim: int = 5120
    encoder_layers: int = 32             # full whisper encoder depth
    quantize_position: int = 16          # VQ after this many layers
    pooling_position: int = 16
    pooling_kernel_size: int = 4
    quantize_vocab_size: int = 16384
    max_source_positions: int = 1500     # post-conv positions (30 s)
    causal_attention: bool = True
    quantize_causal_block_size: int = 200  # used when causal_attention=False
    quantize_ema_decay: float = 0.99
    quantize_commit_coefficient: float = 0.25
    quantize_loss_scale: float = 10.0
    quantize_restart_interval: int = 100
    activation: str = "gelu"
    # ASR-supervision head (training-time; quantize_encoder_only checkpoints
    # ship without it, config.json:55)
    include_post_vq: bool = False        # encoder layers after the VQ
    decoder_layers: int = 4
    decoder_attention_heads: int = 20
    decoder_ffn_dim: int = 5120
    vocab_size: int = 51866
    max_target_positions: int = 448

    # feature-extractor constants (whisper_feat_extractor.py / HF whisper)
    sampling_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160

    @property
    def head_dim(self) -> int:
        return self.d_model // self.attention_heads

    @property
    def samples_per_token(self) -> int:
        # conv2 stride 2 * pool 4 * hop 160 = 1280 samples = 80 ms
        return 2 * self.pooling_kernel_size * self.hop_length


def glm4_voice_tokenizer_config() -> WhisperVQConfig:
    return WhisperVQConfig()


def tiny_tokenizer_config() -> WhisperVQConfig:
    return WhisperVQConfig(
        num_mel_bins=8, d_model=16, attention_heads=2, ffn_dim=24,
        encoder_layers=3, quantize_position=2, pooling_position=2,
        quantize_vocab_size=32, max_source_positions=64,
        decoder_layers=2, decoder_attention_heads=2, decoder_ffn_dim=24,
        vocab_size=64, max_target_positions=32)
