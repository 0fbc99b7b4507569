"""CosyVoice-v1 TransformerLM (legacy text -> speech-token LM).

Rebuilds cosyvoice/llm/llm.py:32-229: text embedding -> conformer text
encoder -> affine -> decoder-only transformer over
[sos, text_enc, task_id, speech] with a label-smoothed CE head.  The v2
Qwen2 path (speech_lm.py) supersedes this; kept for checkpoint/API parity.

Generation runs inside one jitted lax.scan with full-prefix recompute per
step (no KV cache) — fine at v1's sequence lengths and keeps the module
trivially correct; use the Qwen2 path for production decode.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..flow.encoder import ConformerEncoderLayer, LinearEmbed
from ...ops.embeddings import espnet_rel_pos
from ...ops.masks import chunk_attention_mask
from ...utils.config import EncoderConfig
from .speech_lm import ras_sample, SpeechLMConfig


@dataclasses.dataclass(frozen=True)
class TransformerLMConfig:
    text_token_size: int = 51866
    speech_token_size: int = 4096
    text_encoder_input_size: int = 512
    llm_input_size: int = 1024
    llm_output_size: int = 1024
    text_encoder: EncoderConfig = EncoderConfig(
        input_size=512, output_size=1024, attention_heads=8,
        linear_units=2048, num_blocks=3, macaron_style=False,
        use_cnn_module=False, dropout_rate=0.0)
    llm_blocks: int = 3
    sampling: SpeechLMConfig = SpeechLMConfig()


def tiny_transformer_lm_config() -> TransformerLMConfig:
    enc = EncoderConfig(input_size=16, output_size=24, attention_heads=2,
                        linear_units=32, num_blocks=1, macaron_style=False,
                        use_cnn_module=False, dropout_rate=0.0)
    return TransformerLMConfig(
        text_token_size=50, speech_token_size=32,
        text_encoder_input_size=16, llm_input_size=24, llm_output_size=24,
        text_encoder=enc, llm_blocks=2,
        sampling=SpeechLMConfig(speech_token_size=32, top_k=8, win_size=4))


class _DecoderOnly(nn.Module):
    """Causal transformer over embeddings (the wenet TransformerEncoder
    role with subsequent masks; input_layer='linear_legacy' adds a ReLU,
    subsampling.py:338-361)."""

    cfg: TransformerLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        # TransformerEncoder defaults to relu FF activation
        # (encoder.py:359,382) unlike the conformer's swish
        enc_cfg = dataclasses.replace(
            c.text_encoder, output_size=c.llm_output_size,
            input_size=c.llm_input_size, activation="relu")
        t = x.shape[1]
        x = LinearEmbed(c.llm_output_size, 0.0, relu=True, name="embed")(x)
        pos = espnet_rel_pos(t, c.llm_output_size).astype(x.dtype)
        ar = jnp.arange(t)
        causal = (ar[None, :] <= ar[:, None])[None] & valid[:, None, :]
        for i in range(c.llm_blocks):
            x = ConformerEncoderLayer(enc_cfg, name=f"layers_{i}")(
                x, causal, pos, valid)
        return nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)


class TransformerLM(nn.Module):
    cfg: TransformerLMConfig

    def setup(self):
        c = self.cfg
        self.text_embedding = nn.Embed(c.text_token_size,
                                       c.text_encoder_input_size,
                                       name="text_embedding")
        self.text_encoder_layers = [
            ConformerEncoderLayer(c.text_encoder, name=f"text_enc_{i}")
            for i in range(c.text_encoder.num_blocks)]
        self.text_embed_in = LinearEmbed(c.text_encoder.output_size, 0.0,
                                         name="text_embed_in")
        self.text_after_norm = nn.LayerNorm(epsilon=1e-5,
                                            name="text_after_norm")
        self.text_encoder_affine_layer = nn.Dense(
            c.llm_input_size, name="text_encoder_affine_layer")
        self.spk_embed_affine_layer = nn.Dense(
            c.llm_input_size, name="spk_embed_affine_layer")
        self.llm_embedding = nn.Embed(2, c.llm_input_size,
                                      name="llm_embedding")
        # speech_token_size rows (llm.py:72) — eos (== speech_token_size)
        # is an OUTPUT-only id, never embedded; _lm_inputs clips padded
        # eos slots before lookup
        self.speech_embedding = nn.Embed(c.speech_token_size,
                                         c.llm_input_size,
                                         name="speech_embedding")
        self.llm = _DecoderOnly(c, name="llm")
        self.llm_decoder = nn.Dense(c.speech_token_size + 1,
                                    name="llm_decoder")

    def encode_text(self, text: jnp.ndarray,
                    text_valid: jnp.ndarray) -> jnp.ndarray:
        """Conformer text encoder; the reference decodes it with
        decoding_chunk_size=1, left=-1 (llm.py:84) = a causal mask."""
        x = self.text_embedding(text)
        x = self.text_embed_in(x)
        pos = espnet_rel_pos(x.shape[1],
                             self.cfg.text_encoder.output_size
                             ).astype(x.dtype)
        mask = chunk_attention_mask(text_valid, 1)
        for layer in self.text_encoder_layers:
            x = layer(x, mask, pos, text_valid)
        x = self.text_after_norm(x)
        return self.text_encoder_affine_layer(x)

    def embed_spk(self, spk: jnp.ndarray) -> jnp.ndarray:
        """L2-normalize + affine the x-vector (llm.py:124-126)."""
        spk = spk / jnp.maximum(
            jnp.linalg.norm(spk, axis=-1, keepdims=True), 1e-12)
        return self.spk_embed_affine_layer(spk)

    def _lm_inputs(self, text_enc, text_valid, speech, speech_valid,
                   spk=None):
        """[sos, (spk), text_enc, task, speech] (llm.py:91-97,196-203)."""
        sos = self.llm_embedding(jnp.zeros((text_enc.shape[0], 1),
                                           jnp.int32))
        task = self.llm_embedding(jnp.ones((text_enc.shape[0], 1),
                                           jnp.int32))
        # clip eos-padded ids: the table has speech_token_size rows
        # (llm.py:72) and jnp.take's OOB mode is fill-with-NaN, which
        # 0*NaN-leaks through masked attention
        sp = self.speech_embedding(
            jnp.minimum(speech, self.cfg.speech_token_size - 1))
        ones = jnp.ones((text_enc.shape[0], 1), bool)
        parts, vparts = [sos], [ones]
        if spk is not None:
            parts.append(self.embed_spk(spk)[:, None])
            vparts.append(ones)
        parts += [text_enc, task, sp]
        vparts += [text_valid, ones, speech_valid]
        return jnp.concatenate(parts, axis=1), jnp.concatenate(vparts,
                                                               axis=1)

    def __call__(self, text, text_valid, speech, speech_valid, spk=None):
        """Teacher-forced logits over the full sequence (training)."""
        text_enc = self.encode_text(text, text_valid)
        x, valid = self._lm_inputs(text_enc, text_valid, speech,
                                   speech_valid, spk)
        h = self.llm(x, valid)
        return self.llm_decoder(h), valid

    def generate(self, text: jnp.ndarray, text_valid: jnp.ndarray,
                 key: jax.Array, max_len: int = 32, spk=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """AR sampling with RAS; full-prefix recompute per step in a scan."""
        c = self.cfg
        eos = c.speech_token_size
        text_enc = self.encode_text(text, text_valid)
        b = text.shape[0]
        assert b == 1
        prefix_len = 1 + (0 if spk is None else 1) + text.shape[1] + 1

        def step(mdl, carry, _):
            tokens, n, done, hist, key = carry
            key, ks = jax.random.split(key)
            sp_valid = jnp.arange(max_len)[None, :] < n
            x, valid = mdl._lm_inputs(text_enc, text_valid,
                                      tokens[None], sp_valid, spk)
            h = mdl.llm(x, valid)
            idx = prefix_len - 1 + n
            logits = mdl.llm_decoder(h[0, idx])
            logp = jax.nn.log_softmax(logits)
            tok = ras_sample(ks, logp, hist, c.sampling)
            is_eos = tok >= eos
            tokens = tokens.at[n].set(
                jnp.where(done | is_eos, eos, tok).astype(jnp.int32))
            n = jnp.where(done | is_eos, n, n + 1)
            # decoded-token history ring feeds RAS like the reference's
            # out_tokens (llm.py:146-155,223-228)
            hist = jnp.where(done | is_eos, hist,
                             jnp.roll(hist, -1).at[-1].set(tok))
            return (tokens, n, done | is_eos, hist, key), ()

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, length=max_len)
        init = (jnp.full((max_len,), eos, jnp.int32),
                jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                jnp.full((c.sampling.win_size,), -1, jnp.int32), key)
        (tokens, n, _, _, _), _ = scan(self, init, None)
        return tokens, n
