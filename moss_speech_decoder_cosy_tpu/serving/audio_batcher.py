"""Continuous-batching audio serving: async engine + HTTP streaming server.

The reference serves concurrent token->wav streams with per-uuid GPU work
under a lock (GLM_modules/cosyvoice/cli/model.py:60-65 session dicts);
vLLM-style continuous batching exists only for its LM.  Here the FLOW
decode itself batches continuously (pipeline/kv_batcher.py): N live
requests cost ONE estimator-wavefront dispatch per tick regardless of
their phases.  This module is the asyncio serving layer on top — the audio
twin of token_server.BatcherSSEServer over lm_server.ContinuousBatcher:

- ``AudioBatchEngine``: admission awaits a free lane; push/finish mutate
  shared device state only under the engine lock; ONE pump task advances
  all lanes and fans wav chunks out to per-request asyncio queues; the
  pump idle-sleeps when ``KVContinuousBatcher.has_work()`` says a burst
  would be a no-op.
- ``AudioBatcherHTTPServer``: POST /decode_stream streaming the decoded
  audio back as chunked ``audio/L16`` (raw pcm16) or ``audio/ogg``
  (standard Ogg Opus via serving/ogg.py) while later chunks are still
  being computed.
"""

from __future__ import annotations

import asyncio
import json
from typing import AsyncIterator, Dict, Optional

import numpy as np

try:
    from aiohttp import web
except ImportError:                                     # pragma: no cover
    web = None


class AudioStream:
    """One admitted request: async push/finish + async-iterate wav chunks
    (float32 ``(1, samples)``; ends when the engine drains the lane)."""

    def __init__(self, engine: "AudioBatchEngine", lane: int):
        self._engine = engine
        self.lane = lane
        self._q: asyncio.Queue = asyncio.Queue()
        self.finished = False

    async def push(self, tokens) -> None:
        await self._engine._call(self._engine.batcher.push, self.lane,
                                 np.asarray(tokens))
        self._engine._kick()

    async def finish(self) -> None:
        self.finished = True
        await self._engine._call(self._engine.batcher.finish, self.lane)
        self._engine._kick()

    def __aiter__(self) -> AsyncIterator[np.ndarray]:
        return self

    async def __anext__(self) -> np.ndarray:
        chunk = await self._q.get()
        if chunk is None:
            raise StopAsyncIteration
        return chunk


def plan_lanes(decoder, n_lanes: int, ring_tokens: Optional[int],
               block_size: Optional[int], hbm_budget_bytes: int,
               fused: bool = True):
    """HBM admission plan for the est-ring pool (the round-3 finding:
    rings are ~0.3 GB/stream bf16 at ring 35, and batch 16 OOMs a
    v5e-16GB without mitigation).  Given a ring-pool budget, pick the
    cheapest configuration that serves ``n_lanes``:

    1. the requested (fused bf16) rings, if they fit;
    2. int8-quantized rings (pipeline ring_quant — concat dataflow,
       ~4x smaller), if those fit;
    3. otherwise CAP the lane count to what the int8 rings afford —
       overflow requests wait for a free lane in ``open()`` (graceful
       backpressure) instead of OOMing the chip.

    Returns (n_lanes, ring_quant, per_lane_bytes, note)."""
    from ..models.flow.kv_stream import init_kv_cache, est_cache_bytes
    import jax
    hop = block_size or decoder.pipe_cfg.block_size
    ring = (ring_tokens if ring_tokens is not None
            else decoder.pipe_cfg.max_token_len - hop)
    dt = decoder.compute_dtype or jax.numpy.float32
    est_dt = decoder.estimator_dtype or dt

    def lane_bytes(quant):
        est = jax.eval_shape(
            lambda: init_kv_cache(decoder.flow_cfg, ring, batch=1,
                                  dtype=dt, est_dtype=est_dt,
                                  est_quant=quant)["est"])
        b = est_cache_bytes(est)
        if fused and not quant:       # extended write-then-attend rings
            rf = ring * decoder.ratio
            b = int(b * (rf + hop * decoder.ratio) / max(rf, 1))
        return b

    full_b = lane_bytes(False)
    if n_lanes * full_b <= hbm_budget_bytes:
        return n_lanes, False, full_b, "full-precision rings fit"
    q_b = lane_bytes(True)
    if n_lanes * q_b <= hbm_budget_bytes:
        return (n_lanes, True, q_b,
                f"spilled to int8 rings ({full_b >> 20} -> {q_b >> 20} "
                f"MiB/lane)")
    capped = max(1, hbm_budget_bytes // q_b)
    return (capped, True, q_b,
            f"int8 rings + lanes capped {n_lanes} -> {capped} "
            f"(budget {hbm_budget_bytes >> 20} MiB)")


class AudioBatchEngine:
    """Lane admission + pump loop over one KVContinuousBatcher.

    ``hbm_budget_bytes`` (optional) applies the ``plan_lanes`` spill
    policy before allocating the ring pool; the chosen plan is recorded
    on ``self.lane_plan``."""

    def __init__(self, decoder, n_lanes: int = 4,
                 block_size: Optional[int] = None,
                 ring_tokens: Optional[int] = None,
                 token_cap: int = 1024,
                 pump_iters: int = 8, idle_sleep_s: float = 0.002,
                 hbm_budget_bytes: Optional[int] = None):
        ring_quant = False
        self.lane_plan = None
        if hbm_budget_bytes is not None:
            n_lanes, ring_quant, per_lane, note = plan_lanes(
                decoder, n_lanes, ring_tokens, block_size,
                hbm_budget_bytes)
            self.lane_plan = {"n_lanes": n_lanes,
                              "ring_quant": ring_quant,
                              "per_lane_bytes": per_lane, "note": note}
        self.batcher = decoder.kv_batcher(
            n_lanes=n_lanes, block_size=block_size,
            ring_tokens=ring_tokens, token_cap=token_cap,
            ring_quant=ring_quant)
        self.decoder = decoder
        self.pump_iters = pump_iters
        self.idle_sleep_s = idle_sleep_s
        self._streams: Dict[int, AudioStream] = {}
        self._lock = asyncio.Lock()
        self._pump_task: Optional[asyncio.Task] = None
        self._wake = asyncio.Event()

    async def _call(self, fn, *args):
        """Run a (device-blocking) batcher call in the default executor
        under the engine lock, so it never races the pump's jits."""
        loop = asyncio.get_running_loop()
        async with self._lock:
            return await loop.run_in_executor(None, lambda: fn(*args))

    def _kick(self) -> None:
        self._wake.set()

    # ------------------------------------------------------------ lifecycle
    async def open(self, prompt_token=None, prompt_feat=None,
                   embedding=None) -> AudioStream:
        """Admit a stream (awaits a free lane).  ``None`` prompt pieces
        default to empty / zero speaker embedding."""
        d = self.decoder
        if prompt_token is None:
            prompt_token = np.zeros((1, 0), np.int32)
        if prompt_feat is None:
            prompt_feat = np.zeros(
                (1, prompt_token.shape[1] * d.ratio,
                 d.flow_cfg.output_size), np.float32)
        if embedding is None:
            embedding = np.zeros((1, d.flow_cfg.spk_embed_dim), np.float32)
        loop = asyncio.get_running_loop()
        while True:
            async with self._lock:
                if self.batcher.free_lanes > 0:
                    lane = await loop.run_in_executor(
                        None, lambda: self.batcher.admit(
                            np.asarray(prompt_token, np.int32),
                            np.asarray(prompt_feat, np.float32),
                            np.asarray(embedding, np.float32)))
                    stream = AudioStream(self, lane)
                    self._streams[lane] = stream
                    break
            await asyncio.sleep(0.01)           # pool full: wait for a lane
        if self._pump_task is None or self._pump_task.done():
            self._pump_task = asyncio.ensure_future(self._pump_loop())
        self._kick()
        return stream

    async def _pump_loop(self):
        loop = asyncio.get_running_loop()
        try:
            while self._streams:
                async with self._lock:
                    if not self.batcher.has_work():
                        do_pump = False
                    else:
                        do_pump = True
                        out = await loop.run_in_executor(
                            None, lambda: self.batcher.pump(
                                max_iters=self.pump_iters))
                if not do_pump:
                    # nothing a burst could advance: wait for push/finish
                    self._wake.clear()
                    try:
                        await asyncio.wait_for(self._wake.wait(),
                                               self.idle_sleep_s)
                    except asyncio.TimeoutError:
                        pass
                    continue
                for lane, chunk in out.items():
                    s = self._streams.get(lane)
                    if s is not None:
                        s._q.put_nowait(chunk)
                # lanes freed inside pump() have fully drained
                for lane in list(self._streams):
                    if not self.batcher._lanes[lane].active:
                        self._streams[lane]._q.put_nowait(None)
                        del self._streams[lane]
                await asyncio.sleep(0)
        except Exception:                       # engine failure: close all
            import logging
            logging.exception("audio batcher pump failed; closing streams")
            for s in self._streams.values():
                s._q.put_nowait(None)
            self._streams.clear()
            raise
        finally:
            self._pump_task = None


class AudioBatcherHTTPServer:
    """POST /decode_stream over an AudioBatchEngine.

    Request JSON: {"tokens": [...], "prompt_token": [...]?,
    "prompt_feat": [[...]]?, "embedding": [...]?,
    "format": "pcm16"|"oggopus"}.  The response body streams while the
    decode is still running: ``audio/L16`` is raw little-endian int16 at
    the decoder's sample rate; ``audio/ogg`` is a standard Ogg Opus
    stream (RFC 7845)."""

    def __init__(self, engine: AudioBatchEngine,
                 host: str = "0.0.0.0", port: int = 10010):
        assert web is not None
        self.engine = engine
        self.host, self.port = host, port
        self.app = web.Application()
        self.app.add_routes([web.post("/decode_stream", self.handle)])

    async def handle(self, request):
        params = await request.json()
        fmt = params.get("format", "pcm16")
        sr = self.engine.decoder.pipe_cfg.sample_rate
        if fmt == "oggopus":
            from .opus import available
            if not available():
                return web.json_response(
                    {"error": "libopus not available"}, status=501)
            from .ogg import OggOpusWriter
            writer = OggOpusWriter(sample_rate=sr)
            ctype = "audio/ogg"
        elif fmt == "pcm16":
            writer = None
            ctype = "audio/L16"
        else:
            return web.json_response(
                {"error": f"unknown format {fmt!r}"}, status=400)

        def arr(key, dtype, default):
            v = params.get(key)
            return default if v is None else np.asarray(v, dtype)

        stream = await self.engine.open(
            prompt_token=arr("prompt_token", np.int32, None),
            prompt_feat=arr("prompt_feat", np.float32, None),
            embedding=arr("embedding", np.float32, None))
        await stream.push(np.asarray(params["tokens"], np.int32))
        await stream.finish()

        resp = web.StreamResponse(headers={
            "Content-Type": ctype,
            "X-Sample-Rate": str(sr),
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        async for chunk in stream:
            pcm = np.clip(chunk[0], -1.0, 1.0)
            if writer is None:
                await resp.write(
                    (pcm * 32767.0).astype("<i2").tobytes())
            else:
                data = writer.encode(pcm.astype(np.float32))
                if data:
                    await resp.write(data)
        if writer is not None:
            await resp.write(writer.flush())
        await resp.write_eof()
        return resp

    def run(self):                                      # pragma: no cover
        web.run_app(self.app, host=self.host, port=self.port)


async def decode_stream_client(url: str, payload: dict) -> np.ndarray:
    """Client for /decode_stream: returns float32 (1, samples)."""
    import aiohttp
    async with aiohttp.ClientSession() as session:
        async with session.post(url, json=payload) as resp:
            resp.raise_for_status()
            body = await resp.read()
            ctype = resp.headers["Content-Type"]
            sr = int(resp.headers["X-Sample-Rate"])
            if ctype == "audio/L16":
                pcm = np.frombuffer(body, "<i2").astype(np.float32) / 32767.0
                return pcm[None]
            from .ogg import OggOpusReader
            reader = OggOpusReader(sample_rate=sr)
            return np.asarray(reader.decode(body), np.float32)[None]
