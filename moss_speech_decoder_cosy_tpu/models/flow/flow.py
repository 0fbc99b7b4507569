"""CausalMaskedDiffWithXvec: speech tokens -> mel via conditional flow
matching (reference cosyvoice/flow/flow.py:151-283).

The module is a pure function of (tokens, valid-mask, prompt mel, speaker
embedding) with static ``streaming``/``finalize`` flags, so each streaming
hop is a single jitted dispatch.  The pipeline layer owns all session state.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .encoder import UpsampleConformerEncoder
from .cfm import CausalConditionalCFM
from ...utils.config import FlowConfig


class CausalMaskedDiffWithXvec(nn.Module):
    cfg: FlowConfig

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size,
                                        name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(c.output_size,
                                               name="spk_embed_affine_layer")
        self.encoder = UpsampleConformerEncoder(c.encoder, name="encoder")
        self.encoder_proj = nn.Dense(c.output_size, name="encoder_proj")
        self.decoder = CausalConditionalCFM(c.cfm, c.estimator,
                                            name="decoder")

    def _embed_tokens(self, token: jnp.ndarray,
                      valid: jnp.ndarray) -> jnp.ndarray:
        x = self.input_embedding(jnp.maximum(token, 0))
        return x * valid[..., None].astype(x.dtype)

    def _spk(self, embedding: jnp.ndarray) -> jnp.ndarray:
        norm = jnp.linalg.norm(embedding, axis=-1, keepdims=True)
        emb = embedding / jnp.maximum(norm, 1e-12)
        return self.spk_embed_affine_layer(emb)

    def encode(self, token: jnp.ndarray, valid: jnp.ndarray,
               streaming: bool, finalize: bool, attn_masks=None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """token (B, Ttot) -> (mu (B, Tm, n_mel), mel_valid (B, Tm)).

        In the non-finalize streaming hop the last ``pre_lookahead_len``
        tokens act as encoder context and produce no output frames
        (flow.py:262-263)."""
        c = self.cfg
        x = self._embed_tokens(token, valid)
        if finalize:
            h, mel_valid = self.encoder(x, valid, context=None,
                                        streaming=streaming,
                                        attn_masks=attn_masks)
        else:
            la = c.pre_lookahead_len
            ctx = x[:, token.shape[1] - la:]
            h, mel_valid = self.encoder(x[:, : token.shape[1] - la],
                                        valid[:, : token.shape[1] - la],
                                        context=ctx, streaming=streaming,
                                        attn_masks=attn_masks)
        mu = self.encoder_proj(h)
        return mu, mel_valid

    def __call__(self, token: jnp.ndarray, valid: jnp.ndarray,
                 prompt_feat: jnp.ndarray, embedding: jnp.ndarray,
                 streaming: bool = False, finalize: bool = True,
                 kv_masks=None) -> jnp.ndarray:
        """Inference: returns the FULL mel (B, Tm, n_mel) including the
        prompt region; callers slice ``[:, prompt_len*ratio:]`` (the
        reference returns both views, flow.py:281-283).

        token: (B, Ttot) prompt tokens ++ chunk tokens (right-padding allowed
          if masked out by ``valid``).
        prompt_feat: (B, P, n_mel) prompt mel, P = prompt_tokens * ratio.
        embedding: (B, spk_embed_dim) x-vector.
        """
        c = self.cfg
        spks = self._spk(embedding)
        enc_masks = (kv_masks[0], kv_masks[1]) if kv_masks else None
        mu, mel_valid = self.encode(token, valid, streaming, finalize,
                                    attn_masks=enc_masks)
        p = prompt_feat.shape[1]
        conds = jnp.zeros_like(mu)
        conds = conds.at[:, :p].set(prompt_feat.astype(mu.dtype))
        return self.decoder(mu, mel_valid, spks=spks, cond=conds,
                            streaming=streaming,
                            attn_mask=kv_masks[2] if kv_masks else None)

    def loss(self, token: jnp.ndarray, token_valid: jnp.ndarray,
             feat: jnp.ndarray, feat_valid: jnp.ndarray,
             embedding: jnp.ndarray, rng: jax.Array,
             streaming: bool = True) -> jnp.ndarray:
        """Training objective (flow.py:189-235): unified streaming training,
        50% prompt-conditioning dropout with a random prompt prefix."""
        k_cond, k_keep, k_cfm, k_drop = jax.random.split(rng, 4)
        b, tm = feat.shape[:2]
        spks = self._spk(embedding)
        x = self._embed_tokens(token, token_valid)
        h, mel_valid = self.encoder(x, token_valid, streaming=streaming,
                                    deterministic=False)
        mu = self.encoder_proj(h)
        mel_valid = mel_valid & feat_valid

        # random prompt prefix as cond, dropped 50% of the time (flow.py:218)
        lens = jnp.sum(feat_valid, axis=1)
        frac = jax.random.uniform(k_cond, (b,))
        idx = (frac * 0.3 * lens).astype(jnp.int32)
        keep = jax.random.bernoulli(k_keep, 0.5, (b,))
        pos = jnp.arange(tm)[None, :]
        cond_mask = (pos < idx[:, None]) & keep[:, None]
        conds = feat * cond_mask[..., None].astype(feat.dtype)

        loss, _ = self.decoder.compute_loss(
            feat, mel_valid, mu[:, :tm], spks, conds, k_cfm,
            streaming=streaming)
        return loss
