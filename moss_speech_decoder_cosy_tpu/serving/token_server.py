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


async def consume_sse(url: str, payload: dict) -> AsyncIterable[int]:
    """Async client for /generate_stream (web_demo.py:133 analogue)."""
    import aiohttp
    async with aiohttp.ClientSession() as session:
        async with session.post(url, json=payload) as resp:
            async for raw in resp.content:
                line = raw.decode().strip()
                if line.startswith("data:"):
                    yield int(json.loads(line[5:])["token_id"])
