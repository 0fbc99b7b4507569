"""Server boot-time warm-start.

The driver's cold-cache bench measured ~8 min of remote XLA compiles
before the first real chunk (BENCH_NOTES).  This module owns that cost at
BOOT instead of first-request time:

1. ``enable_persistent_cache()`` points jax at an on-disk compilation
   cache, so a cold PROCESS reloads compiled TPU binaries in seconds
   instead of recompiling (the TPU answer to the reference's serialized
   TRT engines, flow_matching.py:129-156 / load_trt).
2. ``boot_warmup()`` drives every per-session jitted program (tokenizer
   streaming step, flow hop ladder, vocoder hops) through a throwaway
   session with the production shapes BEFORE the server accepts traffic,
   so the first request only pays compute.

Wired into examples/serve.py; tested by
tests/test_serving.py::test_boot_warmup_compiles_hop_programs.
"""

from __future__ import annotations

import os
import time
from typing import Optional


def enable_persistent_cache(cache_dir: Optional[str] = None) -> str:
    """Enable jax's on-disk compilation cache (idempotent)."""
    import jax
    cache_dir = cache_dir or os.environ.get(
        "MOSS_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


def boot_warmup(codec=None, decoder=None, prompt=None,
                n_tokens: int = 64, verbose: bool = True) -> float:
    """Compile the serving-path programs before the first request.

    ``codec``: a SpeechCodec (tokenizer side warmed too), or ``decoder``:
    a bare AudioDecoder.  ``prompt``: the prompt the real sessions will
    use — hop program shapes depend on its length, so warm with the SAME
    prompt geometry.  Returns the wall seconds spent (compile or cache
    load)."""
    import numpy as np

    t0 = time.perf_counter()
    enable_persistent_cache()
    dec = decoder if decoder is not None else codec.decoder

    if prompt is not None:
        session = dec.new_session(prompt.token, prompt.feat,
                                  prompt.embedding)
    else:
        session = dec.new_session()
    rng = np.random.RandomState(0)
    toks = rng.randint(0, dec.flow_cfg.vocab_size, (n_tokens,))
    # feed hop-sized pieces then finalize: compiles the first-hop,
    # steady-hop and finalize programs (the 3-shape ladder)
    for i in range(0, n_tokens, dec.pipe_cfg.block_size):
        list(session.push(toks[i:i + dec.pipe_cfg.block_size]))
    list(session.finish())

    if codec is not None:
        enc = codec.new_encode_session()
        frame = int(0.08 * 16000)
        for _ in range(3):
            list(enc.push(rng.randn(frame).astype(np.float32) * 0.01))
    dt = time.perf_counter() - t0
    if verbose:
        print(f"# boot_warmup: serving programs ready in {dt:.1f}s")
    return dt


def boot_warmup_batcher(batcher, prompt=None, pump_iters: int = 8,
                        warm_tails: bool = True,
                        verbose: bool = True) -> float:
    """Compile the continuous-batcher (pipeline/kv_batcher.py) serving
    programs before traffic: lane prefill with the SAME prompt geometry
    real requests will use (the prefill program is shaped by the prompt
    length), the promptless admit path, every encoder-hop scan bucket
    (8/4/1), the burst wavefront at ``pump_iters``, the per-chunk vocoder
    (first / steady / finalize), the lane scatter/slice/clear programs,
    and — when ``warm_tails`` — one finalize program per possible tail
    token count (a static shape; tail = lookahead + (n - lookahead) % hop).

    Warm the INSTANCE that will serve: the batcher's jits are
    per-instance, so a throwaway batcher would only prime the on-disk
    cache, not the dispatch caches."""
    import numpy as np

    t0 = time.perf_counter()
    enable_persistent_cache()
    d = batcher.dec
    hop, la = batcher.hop, batcher.la
    rng = np.random.RandomState(0)

    def run_stream(n_tokens: int, use_prompt: bool) -> None:
        if use_prompt and prompt is not None:
            lane = batcher.admit(prompt.token, prompt.feat,
                                 prompt.embedding)
        else:
            lane = batcher.admit(
                np.zeros((1, 0), np.int32),
                np.zeros((1, 0, d.flow_cfg.output_size), np.float32),
                np.zeros((1, d.flow_cfg.spk_embed_dim), np.float32))
        toks = rng.randint(0, d.flow_cfg.vocab_size,
                           (1, n_tokens)).astype(np.int32)
        batcher.push(lane, toks)
        batcher.finish(lane)
        while batcher._lanes[lane].active:
            batcher.pump(max_iters=pump_iters)

    # 13 steady chunks exercises every encoder-hop bucket (8 + 4 + 1);
    # covers tail length la (r = 0)
    run_stream(la + hop * 13, prompt is not None)
    # promptless admit path + remaining tail lengths la+1 .. la+hop-1
    run_stream(la + hop, False)
    if warm_tails:
        for r in range(1, hop):
            run_stream(la + hop + r, prompt is not None)
    dt = time.perf_counter() - t0
    if verbose:
        print(f"# boot_warmup_batcher: serving programs ready in {dt:.1f}s")
    return dt
