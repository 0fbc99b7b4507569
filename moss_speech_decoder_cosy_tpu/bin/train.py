"""Training entry point — the reference cosyvoice/bin/train.py rebuilt.

Model selection {flow, hifigan}, data-parallel mesh over all local devices,
grad accumulation, orbax checkpoints with metadata sidecar, scalar logging
(tensorboard when available, JSONL always).

Example:
  python -m moss_speech_decoder_cosy_tpu.bin.train \
      --model flow --train_data shards.list --model_dir exp/flow \
      --epochs 1 --accum_grad 2
"""

from __future__ import annotations

import argparse
import faulthandler
import functools
import json
import os
import time

import numpy as np
import jax

# crash visibility in elastic/fleet runs — the torchrun @record analogue
# (bin/train.py:28,102 in the reference)
faulthandler.enable()


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["flow", "hifigan", "lm", "lm_dpo"],
                   default="flow")
    p.add_argument("--config", default="moss",
                   choices=["moss", "cosyvoice2", "tiny"])
    p.add_argument("--train_data", required=True,
                   help="file listing parquet shard paths")
    p.add_argument("--cv_data", default=None,
                   help="cross-validation shard list; CV loss runs at every "
                        "save (executor.py:273-377 role)")
    p.add_argument("--cv_batches", type=int, default=8)
    p.add_argument("--sample_at_save", action="store_true",
                   help="synthesize a mel sample from the first CV batch at "
                        "every save (the executor's in-training generation)")
    p.add_argument("--dpo_beta", type=float, default=0.01)
    p.add_argument("--ref_checkpoint", default=None,
                   help="frozen reference policy for DPO (defaults to the "
                        "initial/resumed params)")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="resume checkpoint (shape-filtered load)")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--accum_grad", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--peak_lr", type=float, default=1e-3)
    p.add_argument("--warmup_steps", type=int, default=2500)
    p.add_argument("--save_per_step", type=int, default=1000)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--use_mesh", action="store_true", default=True)
    p.add_argument("--tp", type=int, default=1,
                   help="LM tensor-parallel degree: megatron-split params "
                        "on a (data, model) mesh (parallel/tp.py); "
                        "lm/lm_dpo only")
    return p.parse_args()


class MetricLogger:
    """Rank-0 scalar logging: JSONL always, tensorboard when available
    (train_utils.py:330-374)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(log_dir)
        except Exception:
            self.tb = None

    def log(self, step: int, metrics: dict):
        rec = {"step": step, "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.tb:
            for k, v in rec.items():
                if k not in ("step", "time"):
                    self.tb.add_scalar(f"train/{k}", v, step)


def make_dataloader(args, flow_cfg):
    from ..data import DataList, build_pipeline, processor
    shards = [line.strip() for line in open(args.train_data)
              if line.strip()]
    dl = DataList(shards)
    procs = [
        processor.parquet_opener,
        functools.partial(processor.resample, resample_rate=24000),
        processor.compute_fbank,
        processor.parse_embedding,
        functools.partial(processor.shuffle, shuffle_size=500),
        functools.partial(processor.sort, sort_size=100),
        functools.partial(processor.static_batch,
                          batch_size=args.batch_size),
        functools.partial(processor.padding,
                          token_mel_ratio=flow_cfg.token_mel_ratio,
                          gan=args.model == "hifigan"),
    ]
    if args.model == "hifigan":
        procs.insert(3, processor.compute_f0)
    return dl, build_pipeline(dl, procs)


def main():
    args = parse_args()
    from ..utils.config import (moss_flow_config, cosyvoice2_flow_config,
                                tiny_flow_config)
    from ..utils import checkpoint as ckpt
    from ..training import (create_flow_train_state, make_flow_train_step,
                            make_optimizer)
    from ..parallel import make_mesh

    flow_cfg = {"moss": moss_flow_config, "cosyvoice2": cosyvoice2_flow_config,
                "tiny": tiny_flow_config}[args.config]()
    logger = MetricLogger(os.path.join(args.model_dir, "tensorboard"))
    dl, _ = make_dataloader(args, flow_cfg)

    if args.model == "hifigan":
        return train_hifigan(args, flow_cfg, logger)
    if args.model in ("lm", "lm_dpo"):
        return train_lm(args, logger, dpo=args.model == "lm_dpo")

    optimizer = make_optimizer(args.peak_lr, args.warmup_steps)
    model, state, _ = create_flow_train_state(
        flow_cfg, jax.random.PRNGKey(0), optimizer)
    start_step = 0
    if args.checkpoint:
        loaded = ckpt.load_checkpoint(args.checkpoint, like=state.params)
        merged, skipped = ckpt.shape_filtered_merge(state.params, loaded)
        state = state.replace(params=merged)
        meta_path = os.path.join(args.checkpoint, "metadata.json")
        if os.path.exists(meta_path):
            start_step = json.load(open(meta_path)).get("step", 0)
            # schedules are pure functions of state.step; fast-forward it
            # (the reference's scheduler.set_step, bin/train.py:199-201)
            state = state.replace(
                step=jax.numpy.asarray(start_step, jax.numpy.int32))
        print(f"resumed {args.checkpoint} at step {start_step}; "
              f"skipped {len(skipped)} keys")

    mesh = make_mesh() if args.use_mesh and len(jax.devices()) > 1 else None
    jit_step = make_flow_train_step(model, optimizer, mesh=mesh,
                                    accum_steps=args.accum_grad)
    if mesh is not None:
        state = jit_step.shard_state(state)
        step_fn = jit_step(state)
    else:
        step_fn = jit_step

    rng = jax.random.PRNGKey(1)
    step = start_step
    for epoch in range(args.epochs):
        dl.set_epoch(epoch)
        _, pipeline = make_dataloader(args, flow_cfg)
        for batch in pipeline:
            arrays = {k: batch[k] for k in
                      ("speech_token", "token_valid", "speech_feat",
                       "feat_valid")}
            arrays["embedding"] = batch.get(
                "embedding",
                np.zeros((batch["speech_token"].shape[0],
                          flow_cfg.spk_embed_dim), np.float32))
            rng, k = jax.random.split(rng)
            state, metrics = step_fn(state, arrays, k)
            step += 1
            if step % 10 == 0:
                logger.log(step, metrics)
                print(f"epoch {epoch} step {step}: "
                      f"loss={float(metrics['loss']):.4f}")
            if step % args.save_per_step == 0:
                ckpt.save_checkpoint(
                    os.path.join(args.model_dir, f"step_{step}"),
                    jax.device_get(state.params),
                    metadata={"step": step, "epoch": epoch})
                if args.cv_data:
                    run_cv(args, model, flow_cfg, state, step, logger)
            if 0 < args.max_steps <= step:
                break
        ckpt.save_checkpoint(
            os.path.join(args.model_dir, f"epoch_{epoch}"),
            jax.device_get(state.params),
            metadata={"step": step, "epoch": epoch})


def _pad_lm_batch(rows, dpo=False):
    """Collate text/speech token rows into static right-padded arrays."""
    def pad(key, bucket=8):
        arrs = [np.asarray(r[key], np.int32).reshape(-1) for r in rows]
        n = max(len(a) for a in arrs)
        n = ((n + bucket - 1) // bucket) * bucket
        out = np.zeros((len(arrs), n), np.int32)
        for i, a in enumerate(arrs):
            out[i, :len(a)] = a
        return out, np.asarray([len(a) for a in arrs], np.int32)

    text, text_len = pad("text_token")
    batch = {"text_token": text, "text_token_len": text_len}
    if dpo:
        for which in ("chosen", "rejected"):
            tok, tl = pad(f"{which}_token")
            batch[f"{which}_token"] = tok
            batch[f"{which}_token_len"] = tl
    else:
        tok, tl = pad("speech_token")
        batch["speech_token"] = tok
        batch["speech_token_len"] = tl
    return batch


def make_lm_dataloader(args, dpo=False):
    from ..data import DataList, build_pipeline, processor
    shards = [line.strip() for line in open(args.train_data)
              if line.strip()]
    dl = DataList(shards)
    opener = (processor.jsonl_opener if shards[0].endswith(".jsonl")
              else processor.parquet_opener)
    procs = [
        opener,
        functools.partial(processor.shuffle, shuffle_size=500),
        functools.partial(processor.static_batch,
                          batch_size=args.batch_size),
        lambda data: (_pad_lm_batch(rows, dpo=dpo) for rows in data),
    ]
    return dl, build_pipeline(dl, procs)


def train_lm(args, logger, dpo=False):
    """Speech-LM training: teacher-forced CE (llm.py:263-427) or DPO over
    chosen/rejected completions (utils/losses.py:24-60), wired through
    training/lm.py."""
    import optax
    import jax.numpy as jnp
    from ..models.llm.speech_lm import (Qwen2SpeechLM, SpeechLMConfig,
                                        tiny_speech_lm_config)
    from ..training import lm as lm_mod
    from ..training.train_step import make_optimizer
    from ..utils import checkpoint as ckpt

    cfg = (tiny_speech_lm_config() if args.config == "tiny"
           else SpeechLMConfig())
    model = Qwen2SpeechLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                        jnp.zeros((1, 0), jnp.int32), jax.random.PRNGKey(1),
                        max_len=4)
    if args.checkpoint:
        loaded = ckpt.load_checkpoint(args.checkpoint, like=params)
        params, skipped = ckpt.shape_filtered_merge(params, loaded)
        print(f"resumed {args.checkpoint}; skipped {len(skipped)} keys")
    tp = getattr(args, "tp", 1)
    tp_mesh = batch_sharding = None
    if tp > 1:
        # megatron TP + DP on a 2-D mesh: params sharded once, the same
        # jitted step runs with GSPMD-inserted model-axis collectives
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel import make_tp_mesh, tp_shard_params
        tp_mesh = make_tp_mesh(tp=tp)
        params = tp_shard_params(params, tp_mesh)
        batch_sharding = NamedSharding(tp_mesh, P("data"))
        replicated_sharding = NamedSharding(tp_mesh, P())
        print(f"TP{tp}: mesh {dict(tp_mesh.shape)}")
    optimizer = make_optimizer(args.peak_lr, args.warmup_steps)
    opt_state = optimizer.init(params)   # zeros_like inherits TP shardings

    if dpo:
        if args.ref_checkpoint:
            ref_params = ckpt.load_checkpoint(args.ref_checkpoint,
                                              like=params)
            if tp_mesh is not None:
                from ..parallel import tp_shard_params
                ref_params = tp_shard_params(ref_params, tp_mesh)
        else:
            ref_params = jax.tree.map(lambda x: x, params)
        step_fn = lm_mod.make_dpo_train_step(model, optimizer,
                                             beta=args.dpo_beta)
    else:
        step_fn = lm_mod.make_lm_train_step(model, optimizer)

    step = 0
    for epoch in range(args.epochs):
        dl, pipeline = make_lm_dataloader(args, dpo=dpo)
        dl.set_epoch(epoch)
        for batch in pipeline:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if batch_sharding is not None:
                # shard on the data axis when the (dynamic) batch divides
                # it; otherwise replicate the batch for this step (TP
                # still applies — only the DP split is skipped)
                b = next(iter(batch.values())).shape[0]
                if b % tp_mesh.shape["data"] == 0:
                    batch = jax.device_put(batch, batch_sharding)
                else:
                    batch = jax.device_put(batch, replicated_sharding)
            if dpo:
                params, opt_state, metrics = step_fn(params, ref_params,
                                                     opt_state, batch)
            else:
                params, opt_state, metrics = step_fn(params, opt_state,
                                                     batch)
            step += 1
            if step % 10 == 0:
                logger.log(step, metrics)
                print(f"epoch {epoch} step {step}: "
                      f"loss={float(metrics['loss']):.4f}")
            if step % args.save_per_step == 0 or (
                    0 < args.max_steps <= step):
                ckpt.save_checkpoint(
                    os.path.join(args.model_dir, f"lm_step_{step}"),
                    jax.device_get(params),
                    metadata={"step": step, "epoch": epoch})
            if 0 < args.max_steps <= step:
                return


def run_cv(args, model, flow_cfg, state, step, logger):
    """Cross-validation pass + optional sample generation at save cadence
    (reference executor.py:273-377: cv() at every save, plus in-training
    synthesis)."""
    import jax.numpy as jnp
    cv_args = argparse.Namespace(**vars(args))
    cv_args.train_data = args.cv_data
    _, pipeline = make_dataloader(cv_args, flow_cfg)
    loss_fn = jax.jit(
        lambda p, tok, tv, feat, fv, emb, k: model.apply(
            p, tok, tv, feat, fv, emb, k, method=model.loss))
    losses = []
    first = None
    for i, batch in enumerate(pipeline):
        if i >= args.cv_batches:
            break
        if first is None:
            first = batch
        emb = batch.get("embedding",
                        np.zeros((batch["speech_token"].shape[0],
                                  flow_cfg.spk_embed_dim), np.float32))
        losses.append(float(loss_fn(
            state.params, jnp.asarray(batch["speech_token"]),
            jnp.asarray(batch["token_valid"]),
            jnp.asarray(batch["speech_feat"]),
            jnp.asarray(batch["feat_valid"]), jnp.asarray(emb),
            jax.random.PRNGKey(0))))
    if losses:
        cv_loss = float(np.mean(losses))
        logger.log(step, {"cv_loss": cv_loss})
        print(f"step {step}: cv_loss={cv_loss:.4f} ({len(losses)} batches)")
    if args.sample_at_save and first is not None:
        emb = first.get("embedding",
                        np.zeros((first["speech_token"].shape[0],
                                  flow_cfg.spk_embed_dim), np.float32))
        mel = model.apply(state.params,
                          jnp.asarray(first["speech_token"][:1]),
                          jnp.asarray(first["token_valid"][:1]),
                          jnp.zeros((1, 0, flow_cfg.output_size)),
                          jnp.asarray(emb[:1]),
                          streaming=False, finalize=True)
        out = os.path.join(args.model_dir, f"sample_step_{step}.npy")
        np.save(out, np.asarray(mel))
        print(f"step {step}: wrote {out}")


def train_hifigan(args, flow_cfg, logger):
    """GAN fine-tune loop: alternating discriminator/generator turns per
    batch (executor.train_one_epoc_gan, executor.py:94-180)."""
    import functools
    import optax
    import jax.numpy as jnp
    from ..models.hift import HiFTGenerator
    from ..training import gan as gan_mod
    from ..utils.config import moss_hift_config, tiny_hift_config
    from ..utils import checkpoint as ckpt
    from ..ops.melspec import matcha_mel_spectrogram

    hift_cfg = (tiny_hift_config() if args.config == "tiny"
                else moss_hift_config())
    gen = HiFTGenerator(hift_cfg)
    disc = gan_mod.MultipleDiscriminator()
    t0_mel = jnp.zeros((1, 8, hift_cfg.in_channels))
    gp = gen.init(jax.random.PRNGKey(0), t0_mel)
    wav0 = jnp.zeros((1, 8 * hift_cfg.total_upsample))
    dp = disc.init(jax.random.PRNGKey(1), wav0, wav0)
    gen_tx = optax.adam(args.peak_lr, b1=0.8, b2=0.99)
    disc_tx = optax.adam(args.peak_lr, b1=0.8, b2=0.99)
    mel_tf = [functools.partial(
        matcha_mel_spectrogram,
        sampling_rate=hift_cfg.sampling_rate)]
    disc_step, gen_step = gan_mod.make_gan_train_step(
        gen, disc, mel_tf, gen_tx, disc_tx)
    state = gan_mod.GanTrainState(
        step=jnp.zeros((), jnp.int32), gen_params=gp, disc_params=dp,
        gen_opt=gen_tx.init(gp), disc_opt=disc_tx.init(dp))

    rng = jax.random.PRNGKey(2)
    step = 0
    for epoch in range(args.epochs):
        dl, pipeline = make_dataloader(args, flow_cfg)
        dl.set_epoch(epoch)
        for batch in pipeline:
            arrays = {"speech": batch["speech"],
                      "speech_feat": batch["speech_feat"],
                      "pitch_feat": batch["pitch_feat"]}
            rng, k1, k2 = jax.random.split(rng, 3)
            state, dm = disc_step(state, arrays, k1)
            state, gm = gen_step(state, arrays, k2)
            step += 1
            if step % 10 == 0:
                logger.log(step, {**dm, **gm})
                print(f"epoch {epoch} step {step}: "
                      f"gen={float(gm['loss']):.4f} "
                      f"disc={float(dm['loss_disc']):.4f}")
            if step % args.save_per_step == 0 or (
                    0 < args.max_steps <= step):
                ckpt.save_checkpoint(
                    os.path.join(args.model_dir, f"gan_step_{step}"),
                    jax.device_get({"generator": state.gen_params,
                                    "discriminator": state.disc_params}),
                    metadata={"step": step, "epoch": epoch})
            if 0 < args.max_steps <= step:
                return


if __name__ == "__main__":
    main()
