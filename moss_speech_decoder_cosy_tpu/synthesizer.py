"""Text -> speech synthesis: LM + flow + vocoder end to end.

The role of CosyVoice.inference_{sft,zero_shot,cross_lingual}
(cosyvoice/cli/cosyvoice.py:81-194 + cli/model.py's llm->flow hand-off):
speech-token generation from text with optional speaker prompt, streamed
straight into the decoder pipeline.

Text normalization/tokenization is the caller's job (the reference
delegates it to external ttsfrd/wetext + a HF tokenizer); this API takes
text TOKEN IDS.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .codec import Prompt
from .models.llm.speech_lm import Qwen2SpeechLM
from .pipeline import AudioDecoder


class SpeechSynthesizer:
    def __init__(self, lm: Qwen2SpeechLM, lm_params,
                 decoder: AudioDecoder, max_tokens: int = 512):
        self.lm = lm
        self.lm_params = lm_params
        self.decoder = decoder
        self.max_tokens = max_tokens
        self._gen = jax.jit(
            lambda p, text, ps, key: lm.apply(p, text, ps, key,
                                              max_len=max_tokens))

    def _prompt(self, prompt: Optional[Prompt]) -> Prompt:
        if prompt is not None:
            return prompt
        return Prompt(np.zeros((1, 0), np.int32),
                      np.zeros((1, 0, self.decoder.flow_cfg.output_size),
                               np.float32),
                      np.zeros((1, self.decoder.flow_cfg.spk_embed_dim),
                               np.float32))

    def generate_tokens(self, text_ids: np.ndarray,
                        prompt: Optional[Prompt] = None,
                        seed: int = 0) -> np.ndarray:
        """text ids (1, Tt) -> speech tokens (1, n); single-dispatch AR
        generation with the prompt speaker's tokens as acoustic prefix
        (llm.py:428-462)."""
        p = self._prompt(prompt)
        toks, n = self._gen(self.lm_params,
                            jnp.asarray(text_ids, jnp.int32),
                            jnp.asarray(p.token, jnp.int32),
                            jax.random.PRNGKey(seed))
        n = int(n)
        return np.asarray(toks)[:n][None]

    def tts(self, text_ids: np.ndarray, prompt: Optional[Prompt] = None,
            streaming: bool = False, seed: int = 0,
            speed: float = 1.0) -> np.ndarray:
        """Full inference_zero_shot/sft path -> (1, samples) @ 24 kHz."""
        p = self._prompt(prompt)
        tokens = self.generate_tokens(text_ids, prompt, seed)
        if tokens.shape[1] == 0:
            return np.zeros((1, 0), np.float32)
        if streaming:
            return self.decoder.stream_inference(
                tokens, p.token, p.feat, p.embedding)
        return self.decoder.token2wav(tokens, p.token, p.feat, p.embedding,
                                      speed=speed)

    def tts_stream(self, text_ids: np.ndarray,
                   prompt: Optional[Prompt] = None,
                   seed: int = 0) -> Iterator[np.ndarray]:
        """Yield wav chunks as the decoder session consumes generated
        tokens (cli/model.py's producer/consumer, host-side)."""
        p = self._prompt(prompt)
        sess = self.decoder.new_session(p.token, p.feat, p.embedding)
        tokens = self.generate_tokens(text_ids, prompt, seed)
        yield from sess.push(tokens[0])
        yield from sess.finish()
