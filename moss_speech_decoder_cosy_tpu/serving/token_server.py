"""Token streaming server + voice-chat consumer.

- ``TokenSSEServer``: aiohttp POST /generate_stream serving
  ``data: {"token_id": id}`` SSE lines from a pluggable token generator —
  wire-compatible with the reference's FastAPI LLM server
  (GLM_modules/model_server.py:82-130); the LLM itself stays external,
  exactly how the MOSS pipeline consumes it (SURVEY.md §2.5 note).
- ``ChatAudioConsumer``: the web_demo.py:129-172 decode loop: demux
  audio/text token ids by ``audio_offset``, decode audio in ramping blocks
  [25, 50, 100, 150, 200] with the accumulated-prompt streaming scheme
  (prompt_token/prompt_feat grow with each decoded block).
"""

from __future__ import annotations

import asyncio
import json
from typing import AsyncIterable, Callable, Iterable, List, Optional

import numpy as np

try:
    from aiohttp import web
except ImportError:                                     # pragma: no cover
    web = None


class TokenSSEServer:
    def __init__(self, generate_fn: Callable[[dict], Iterable[int]],
                 host: str = "0.0.0.0", port: int = 10000):
        assert web is not None
        self.generate_fn = generate_fn
        self.host, self.port = host, port
        self.app = web.Application()
        self.app.add_routes([web.post("/generate_stream", self.handle)])

    async def handle(self, request):
        params = await request.json()
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        loop = asyncio.get_running_loop()
        it = iter(self.generate_fn(params))

        def next_token():
            try:
                return next(it)
            except StopIteration:
                return None

        while True:
            tok = await loop.run_in_executor(None, next_token)
            if tok is None:
                break
            line = json.dumps({"token_id": int(tok)})
            await resp.write(f"data: {line}\n\n".encode())
        await resp.write_eof()
        return resp

    def run(self):                                      # pragma: no cover
        web.run_app(self.app, host=self.host, port=self.port)


class ChatAudioConsumer:
    """Streams LLM tokens into audio using the prompt-growing block scheme
    of web_demo.py:129-172."""

    BLOCK_SIZES = (25, 50, 100, 150, 200)

    def __init__(self, decoder, audio_offset: int,
                 end_token_id: Optional[int] = None):
        self.decoder = decoder                          # pipeline.AudioDecoder
        self.audio_offset = audio_offset
        self.end_token_id = end_token_id
        self.text_tokens: List[int] = []
        self.audio_tokens: List[int] = []
        self._decoded_tokens = np.zeros((1, 0), np.int32)
        self._decoded_mel = np.zeros(
            (1, 0, decoder.flow_cfg.output_size), np.float32)
        self._block_idx = 0
        self.wav_chunks: List[np.ndarray] = []

    def _block_size(self) -> int:
        i = min(self._block_idx, len(self.BLOCK_SIZES) - 1)
        return self.BLOCK_SIZES[i]

    def _decode_block(self, finalize: bool):
        if not self.audio_tokens:
            return
        block = np.asarray(self.audio_tokens, np.int32)[None]
        self.audio_tokens = []
        mel = self.decoder._flow_mel(
            block, self._decoded_tokens, self._decoded_mel,
            np.zeros((1, self.decoder.flow_cfg.spk_embed_dim), np.float32),
            streaming=False, finalize=True)
        wav, _ = self.decoder._hift(mel, np.zeros((1, 0, 1), np.float32))
        self.wav_chunks.append(wav)
        self._decoded_tokens = np.concatenate(
            [self._decoded_tokens, block], axis=1)
        self._decoded_mel = np.concatenate([self._decoded_mel, mel], axis=1)
        self._block_idx += 1

    def push(self, token_id: int):
        if self.end_token_id is not None and token_id == self.end_token_id:
            return
        if token_id >= self.audio_offset:
            self.audio_tokens.append(token_id - self.audio_offset)
            if len(self.audio_tokens) >= self._block_size():
                self._decode_block(finalize=False)
        else:
            self.text_tokens.append(token_id)

    def finish(self) -> np.ndarray:
        self._decode_block(finalize=True)
        if self.wav_chunks:
            return np.concatenate(self.wav_chunks, axis=-1)
        return np.zeros((1, 0), np.float32)


class BatcherSSEServer:
    """Multi-request token SSE server over a ContinuousBatcher
    (serving/lm_server.py): concurrent POST /generate_stream requests
    share the slot pool; one pump task advances all slots and fans tokens
    out to the per-request streams.  The reference's model_server.py
    serves one generation thread at a time; this is the natural serving
    upgrade once the engine batches (vLLM-server role).

    Request JSON: {"text_ids": [...], "seed": int, "max_len": int,
    "prompt_speech_ids": [...]?}."""

    def __init__(self, batcher, host: str = "0.0.0.0", port: int = 10000):
        assert web is not None
        self.batcher = batcher
        self.host, self.port = host, port
        self.app = web.Application()
        self.app.add_routes([web.post("/generate_stream", self.handle)])
        self._queues: dict = {}
        self._lock = asyncio.Lock()
        self._pump: Optional[asyncio.Task] = None

    async def _admit(self, params):
        """Submit + register the stream queue atomically vs pump steps
        (both hold the lock), so no emitted token can race past the
        registration."""
        loop = asyncio.get_running_loop()
        while True:
            async with self._lock:
                req = await loop.run_in_executor(
                    None, lambda: self.batcher.submit(
                        np.asarray(params["text_ids"], np.int32),
                        params.get("prompt_speech_ids"),
                        int(params.get("seed", 0)),
                        int(params.get("max_len", 512))))
                if req is not None:
                    first = list(self.batcher.result(req))
                    q = None
                    if not self.batcher.finished(req):
                        q = asyncio.Queue()
                        self._queues[req] = q
                    return req, first, q
            await asyncio.sleep(0.02)           # pool full: wait for a slot

    async def _pump_loop(self):
        loop = asyncio.get_running_loop()
        try:
            while self._queues:
                async with self._lock:
                    out = await loop.run_in_executor(None,
                                                     self.batcher.step)
                for req, toks in out.items():
                    q = self._queues.get(req)
                    if q is not None:
                        for t in toks:
                            q.put_nowait(t)
                for req in list(self._queues):
                    if self.batcher.finished(req):
                        self._queues[req].put_nowait(None)
                        del self._queues[req]
                await asyncio.sleep(0)
        except Exception:                       # engine failure: close all
            import logging
            logging.exception("batcher pump failed; closing streams")
            for q in self._queues.values():
                q.put_nowait(None)
            self._queues.clear()
            raise
        finally:
            self._pump = None

    async def handle(self, request):
        params = await request.json()
        try:
            req, first, q = await self._admit(params)
        except ValueError as e:                 # over-bucket request
            return web.json_response({"error": str(e)}, status=400)
        if q is not None and (self._pump is None or self._pump.done()):
            self._pump = asyncio.ensure_future(self._pump_loop())

        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        for tok in first:
            line = json.dumps({"token_id": int(tok)})
            await resp.write(f"data: {line}\n\n".encode())
        if q is not None:
            while True:
                tok = await q.get()
                if tok is None:
                    break
                line = json.dumps({"token_id": int(tok)})
                await resp.write(f"data: {line}\n\n".encode())
        await resp.write_eof()
        return resp

    def run(self):                                      # pragma: no cover
        web.run_app(self.app, host=self.host, port=self.port)


async def consume_sse(url: str, payload: dict) -> AsyncIterable[int]:
    """Async client for /generate_stream (web_demo.py:133 analogue)."""
    import aiohttp
    async with aiohttp.ClientSession() as session:
        async with session.post(url, json=payload) as resp:
            async for raw in resp.content:
                line = raw.decode().strip()
                if line.startswith("data:"):
                    yield int(json.loads(line[5:])["token_id"])
