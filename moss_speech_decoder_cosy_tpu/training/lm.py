"""Speech-LM training: teacher-forced next-token loss + DPO.

Rebuilds the reference LM objective (cosyvoice/llm/llm.py:263-427):

- per-sample packed sequences [sos, text, task_id, speech, eos] built
  WITHOUT ragged python loops: gather/select by per-sample lengths so the
  whole batch is one static-shape program,
- LabelSmoothingLoss over speech logits (transformer/label_smoothing_loss.py)
  with ignore-padding masking + accuracy metric,
- DPO loss (utils/losses.py:24-60) over chosen/rejected log-probs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.llm.speech_lm import Qwen2SpeechLM


def pack_lm_batch(model: Qwen2SpeechLM, params, text: jnp.ndarray,
                  text_len: jnp.ndarray, speech: jnp.ndarray,
                  speech_len: jnp.ndarray):
    """Build (embeds (B, L, D), targets (B, L), loss_mask (B, L)).

    Layout per sample: [sos, text[:tl], task, speech[:sl], pad...];
    position j's logits predict targets[j]: speech tokens then eos
    (llm.py:296-330 pad_unpad_sequence semantics, vectorized)."""

    def apply(m, text, text_len, speech, speech_len):
        b, tt = text.shape
        ts = speech.shape[1]
        eos = m.cfg.speech_token_size
        l = tt + ts + 2
        pos = jnp.arange(l)[None, :]                   # (1, L)
        tl = text_len[:, None]
        sl = speech_len[:, None]

        text_emb = m.llm.embed_tokens(text)            # (B, Tt, D)
        speech_emb = m.speech_embedding(speech)        # (B, Ts, D)
        sos = m.llm_embedding(jnp.zeros((1,), jnp.int32))[0]
        task = m.llm_embedding(jnp.ones((1,), jnp.int32))[0]

        # index of the text/speech element feeding each position
        t_idx = jnp.clip(pos - 1, 0, tt - 1)
        s_idx = jnp.clip(pos - tl - 2, 0, ts - 1)
        gather_t = jnp.take_along_axis(
            text_emb, jnp.broadcast_to(t_idx, (b, l))[..., None], axis=1)
        gather_s = jnp.take_along_axis(
            speech_emb, jnp.broadcast_to(s_idx, (b, l))[..., None], axis=1)

        is_sos = pos == 0
        is_text = (pos >= 1) & (pos < 1 + tl)
        is_task = pos == 1 + tl
        is_speech = (pos >= 2 + tl) & (pos < 2 + tl + sl)
        embeds = jnp.where(is_sos[..., None], sos[None, None],
                  jnp.where(is_text[..., None], gather_t,
                   jnp.where(is_task[..., None], task[None, None],
                    jnp.where(is_speech[..., None], gather_s, 0.0))))

        # logits at position j predict the token at position j+1; speech
        # region starts at 2+tl, so loss positions are [1+tl, 1+tl+sl]
        tgt_idx = jnp.clip(pos - tl - 1, 0, ts - 1)
        gather_tgt = jnp.take_along_axis(
            speech, jnp.broadcast_to(tgt_idx, (b, l)), axis=1)
        predicts_speech = (pos >= 1 + tl) & (pos < 1 + tl + sl)
        predicts_eos = pos == 1 + tl + sl
        targets = jnp.where(predicts_speech, gather_tgt,
                            jnp.where(predicts_eos, eos, -1))
        loss_mask = predicts_speech | predicts_eos
        return embeds, targets.astype(jnp.int32), loss_mask

    return model.apply(params, text, text_len, speech, speech_len,
                       method=apply)


def label_smoothing_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         mask: jnp.ndarray, smoothing: float = 0.0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KL(label-smoothed one-hot || softmax) averaged over valid positions
    (transformer/label_smoothing_loss.py), plus accuracy."""
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits)
    tgt = jnp.maximum(targets, 0)
    confidence = 1.0 - smoothing
    smooth = smoothing / (v - 1)
    onehot = jax.nn.one_hot(tgt, v) * (confidence - smooth) + smooth
    nll = -jnp.sum(onehot * logp, axis=-1)
    m = mask.astype(logits.dtype)
    loss = jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    acc = jnp.sum((jnp.argmax(logits, -1) == tgt) * m) / jnp.maximum(
        jnp.sum(m), 1.0)
    return loss, acc


def lm_loss(model: Qwen2SpeechLM, params, batch: Dict, smoothing: float = 0.0
            ) -> Tuple[jnp.ndarray, Dict]:
    """batch: text_token (B,Tt), text_token_len (B,), speech_token (B,Ts),
    speech_token_len (B,)."""
    embeds, targets, mask = pack_lm_batch(
        model, params, batch["text_token"], batch["text_token_len"],
        batch["speech_token"], batch["speech_token_len"])

    def fwd(m, e):
        h, _ = m.llm.forward_embeds(e, m.llm.init_cache(e.shape[0]))
        return m.llm_decoder(h)

    logits = model.apply(params, embeds, method=fwd)
    loss, acc = label_smoothing_loss(logits, targets, mask, smoothing)
    return loss, {"loss": loss, "acc": acc}


def sequence_logp(model: Qwen2SpeechLM, params, batch: Dict) -> jnp.ndarray:
    """Sum of per-token log-probs over the speech region (for DPO)."""
    embeds, targets, mask = pack_lm_batch(
        model, params, batch["text_token"], batch["text_token_len"],
        batch["speech_token"], batch["speech_token_len"])

    def fwd(m, e):
        h, _ = m.llm.forward_embeds(e, m.llm.init_cache(e.shape[0]))
        return m.llm_decoder(h)

    logits = model.apply(params, embeds, method=fwd)
    logp = jax.nn.log_softmax(logits)
    tok_logp = jnp.take_along_axis(
        logp, jnp.maximum(targets, 0)[..., None], axis=-1)[..., 0]
    return jnp.sum(tok_logp * mask, axis=-1)


def dpo_loss(policy_chosen: jnp.ndarray, policy_rejected: jnp.ndarray,
             ref_chosen: jnp.ndarray, ref_rejected: jnp.ndarray,
             beta: float = 0.01, label_smoothing: float = 0.0,
             ipo: bool = False):
    """DPO objective (utils/losses.py:24-60)."""
    pi = policy_chosen - policy_rejected
    ref = ref_chosen - ref_rejected
    logits = pi - ref
    if ipo:
        losses = (logits - 1.0 / (2.0 * beta)) ** 2
    else:
        losses = (-jax.nn.log_sigmoid(beta * logits) * (1 - label_smoothing)
                  - jax.nn.log_sigmoid(-beta * logits) * label_smoothing)
    chosen_rw = beta * jax.lax.stop_gradient(policy_chosen - ref_chosen)
    rejected_rw = beta * jax.lax.stop_gradient(policy_rejected - ref_rejected)
    return jnp.mean(losses), chosen_rw, rejected_rw


def make_dpo_train_step(model: Qwen2SpeechLM,
                        optimizer: optax.GradientTransformation,
                        beta: float = 0.01, ipo: bool = False,
                        label_smoothing: float = 0.0):
    """DPO training step over chosen/rejected speech-token completions.

    batch keys: text_token/text_token_len and
    {chosen,rejected}_token/{chosen,rejected}_token_len.
    ``ref_params`` is the frozen reference policy (the pre-DPO checkpoint,
    reference utils/losses.py:24-60 consumers)."""

    def _lp(params, batch, which):
        return sequence_logp(model, params, {
            "text_token": batch["text_token"],
            "text_token_len": batch["text_token_len"],
            "speech_token": batch[f"{which}_token"],
            "speech_token_len": batch[f"{which}_token_len"]})

    def loss_fn(params, ref_params, batch):
        pc = _lp(params, batch, "chosen")
        pr = _lp(params, batch, "rejected")
        rc = jax.lax.stop_gradient(_lp(ref_params, batch, "chosen"))
        rr = jax.lax.stop_gradient(_lp(ref_params, batch, "rejected"))
        loss, crw, rrw = dpo_loss(pc, pr, rc, rr, beta=beta,
                                  label_smoothing=label_smoothing, ipo=ipo)
        metrics = {"loss": loss,
                   "reward_margin": jnp.mean(crw - rrw),
                   "reward_acc": jnp.mean((crw > rrw).astype(jnp.float32))}
        return loss, metrics

    @jax.jit
    def step(params, ref_params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, ref_params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_lm_train_step(model: Qwen2SpeechLM,
                       optimizer: optax.GradientTransformation,
                       smoothing: float = 0.0):
    def loss_fn(params, batch):
        return lm_loss(model, params, batch, smoothing)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step
