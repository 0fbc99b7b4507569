"""RTF measurement harness (cal_RTF.py:349-421 rebuilt).

Protocol: warmup N items first (compile + cache), then
RTF = sum(processing time) / sum(audio duration).  On TPU, timing brackets
``block_until_ready`` instead of cuda events.  Also reports first-chunk
latency for the streaming decode path — the serving north-star
(SURVEY.md §3.2)."""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence

import numpy as np


def measure_encode_rtf(codec, wavs_16k: Sequence[np.ndarray],
                       warmup: int = 2, streaming: bool = False) -> dict:
    """Tokenizer-side RTF over a list of 16 kHz waveforms."""
    fn = codec.encode_streaming if streaming else codec.encode
    for w in wavs_16k[:warmup]:
        fn(w)
    proc = audio = 0.0
    for w in wavs_16k:
        t0 = time.perf_counter()
        fn(w)
        proc += time.perf_counter() - t0
        audio += len(np.asarray(w).reshape(-1)) / 16000.0
    return {"rtf": proc / audio, "proc_s": proc, "audio_s": audio,
            "streaming": streaming}


def measure_tokenizer_rtf(encode_fn: Callable[[np.ndarray], object],
                          wavs: Sequence[np.ndarray], sample_rate: int,
                          warmup: int = 2, name: str = "") -> dict:
    """Adapter hook for comparing EXTERNAL tokenizers under the same
    protocol (the cal_RTF.py:427-516 glm4/dac/mimi comparison role):
    pass any ``wav -> tokens`` callable plus its input sample rate.  The
    DAC and Mimi models themselves are external baselines whose modeling
    code is not in the reference tree (cal_RTF.py:22-30 imports
    ``modeling_dac``/``modeling_mimi`` from absolute cluster paths) — see
    COMPONENTS.md §2.9."""
    for w in wavs[:warmup]:
        encode_fn(w)
    proc = audio = 0.0
    for w in wavs:
        t0 = time.perf_counter()
        encode_fn(w)
        proc += time.perf_counter() - t0
        audio += len(np.asarray(w).reshape(-1)) / sample_rate
    return {"rtf": proc / audio, "proc_s": proc, "audio_s": audio,
            "tokenizer": name}


def measure_decode_rtf(decoder, token_lists: Sequence[np.ndarray],
                       warmup: int = 1, streaming: bool = True,
                       sample_rate: int = 24000,
                       block_size: Optional[int] = None) -> dict:
    """Decoder-side RTF + first-chunk latency over token tensors (1, T)."""
    run = (lambda t: decoder.stream_inference(t, block_size=block_size)) \
        if streaming else decoder.token2wav
    for t in token_lists[:warmup]:
        run(np.asarray(t))

    first_chunk_ms = None
    if streaming:
        sess = decoder.new_session(block_size=block_size)
        need = (block_size or decoder.pipe_cfg.block_size) + decoder.lookahead
        t0 = time.perf_counter()
        next(iter(sess.push(np.asarray(token_lists[0]).reshape(-1)[:need])))
        first_chunk_ms = (time.perf_counter() - t0) * 1e3

    proc = audio = 0.0
    for t in token_lists:
        t0 = time.perf_counter()
        wav = run(np.asarray(t))
        proc += time.perf_counter() - t0
        audio += wav.shape[-1] / sample_rate
    out = {"rtf": proc / audio, "proc_s": proc, "audio_s": audio,
           "streaming": streaming}
    if first_chunk_ms is not None:
        out["first_chunk_ms"] = first_chunk_ms
    return out
