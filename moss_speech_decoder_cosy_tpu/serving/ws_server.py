"""Websocket audio server (aiohttp) — the reference ``server.py`` rebuilt.

Protocol and framing follow server.py:9-108: a binary handshake (0x00),
80 ms audio frames (0x01), text messages (0x02).  Audio payloads are
pcm16, length-prefixed opus packets (serving/opus.py), or standard Ogg
Opus pages wire-compatible with the reference's sphn framing
(serving/ogg.py, codec="ogg").

A pluggable ``handler(samples) -> samples`` processes audio; the default is
echo.  Device work (tokenize/decode) runs in a thread-pool executor so the
event loop keeps serving frames while TPU steps are in flight — the
host/device pipelining the reference gets from CUDA streams + threads
(cli/model.py:58,182-216).  Like the reference, one session at a time holds
the processing lock (server.py:15,94).
"""

from __future__ import annotations

import asyncio
import time
from typing import Awaitable, Callable, Optional

import numpy as np

try:
    from aiohttp import web, WSMsgType
except ImportError:                                     # pragma: no cover
    web = None

from . import protocol
from .protocol import (KIND_HANDSHAKE, KIND_AUDIO, KIND_TEXT, FRAME_SAMPLES)


class AudioWsServer:
    def __init__(self, handler: Optional[Callable] = None,
                 codec: str = "pcm16", host: str = "0.0.0.0",
                 port: int = 8023, log: bool = True):
        assert web is not None, "aiohttp is required for the ws server"
        self.handler = handler or (lambda samples: samples)
        self.codec = codec
        self.host = host
        self.port = port
        self.log = log
        self.lock = asyncio.Lock()
        self.app = web.Application()
        self.app.add_routes([web.get("/api/chat", self.handle_chat)])

    def _make_audio_codec(self):
        if self.codec == "opus":
            from .opus import OpusEncoder, OpusDecoder
            return OpusEncoder(protocol.SAMPLE_RATE), \
                OpusDecoder(protocol.SAMPLE_RATE)
        if self.codec == "ogg":
            # standard Ogg Opus container — wire-compatible with the
            # reference's sphn client framing (serving/ogg.py)
            from .ogg import OggOpusWriter, OggOpusReader
            return OggOpusWriter(protocol.SAMPLE_RATE), \
                OggOpusReader(protocol.SAMPLE_RATE)
        return None, None

    async def handle_chat(self, request):
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        async with self.lock:                          # one active session
            await ws.send_bytes(protocol.frame_message(KIND_HANDSHAKE))
            enc, dec = self._make_audio_codec()
            buf = np.zeros(0, np.float32)
            loop = asyncio.get_running_loop()
            async for msg in ws:
                if msg.type != WSMsgType.BINARY:
                    continue
                kind, payload = protocol.parse_message(msg.data)
                if kind != KIND_AUDIO:
                    continue
                if dec is not None:
                    samples = np.asarray(dec.decode(payload), np.float32)
                else:
                    samples = protocol.pcm16_decode(payload)
                buf = np.concatenate([buf, samples])
                while len(buf) >= FRAME_SAMPLES:
                    frame, buf = (buf[:FRAME_SAMPLES], buf[FRAME_SAMPLES:])
                    t0 = time.perf_counter()
                    out = await loop.run_in_executor(
                        None, self.handler, frame)
                    if self.log:
                        ms = (time.perf_counter() - t0) * 1e3
                        print(f"frame processed in {ms:.1f} ms")
                    if out is None or len(out) == 0:
                        continue
                    if enc is not None:
                        data = enc.encode(np.asarray(out, np.float32))
                        if data:
                            await ws.send_bytes(
                                protocol.frame_message(KIND_AUDIO, data))
                    else:
                        await ws.send_bytes(protocol.frame_message(
                            KIND_AUDIO, protocol.pcm16_encode(out)))
        return ws

    def run(self):                                      # pragma: no cover
        web.run_app(self.app, host=self.host, port=self.port)


async def stream_wav(url: str, samples: np.ndarray, codec: str = "pcm16",
                     frame_samples: int = FRAME_SAMPLES,
                     settle_s: float = 1.0) -> np.ndarray:
    """Headless client (the client_streaming.sh / client.py analogue):
    stream samples to the server, collect returned audio."""
    import aiohttp
    out = []
    if codec == "opus":
        from .opus import OpusEncoder, OpusDecoder
        enc = OpusEncoder(protocol.SAMPLE_RATE)
        dec = OpusDecoder(protocol.SAMPLE_RATE)
    elif codec == "ogg":
        from .ogg import OggOpusWriter, OggOpusReader
        enc = OggOpusWriter(protocol.SAMPLE_RATE)
        dec = OggOpusReader(protocol.SAMPLE_RATE)
    else:
        enc = dec = None
    async with aiohttp.ClientSession() as session:
        async with session.ws_connect(url) as ws:
            msg = await ws.receive_bytes()
            kind, _ = protocol.parse_message(msg)
            assert kind == KIND_HANDSHAKE

            async def sender():
                for i in range(0, len(samples), frame_samples):
                    chunk = samples[i: i + frame_samples]
                    if enc is not None:
                        data = enc.encode(chunk)
                        if not data:
                            continue
                    else:
                        data = protocol.pcm16_encode(chunk)
                    await ws.send_bytes(
                        protocol.frame_message(KIND_AUDIO, data))
                    await asyncio.sleep(0)

            send_task = asyncio.create_task(sender())
            try:
                while True:
                    msg = await asyncio.wait_for(ws.receive(),
                                                 timeout=settle_s)
                    if msg.type != 8 and msg.data:      # not CLOSE
                        kind, payload = protocol.parse_message(msg.data)
                        if kind == KIND_AUDIO:
                            if dec is not None:
                                out.extend(dec.decode(payload))
                            else:
                                out.extend(protocol.pcm16_decode(payload))
                    else:
                        break
            except asyncio.TimeoutError:
                pass
            await send_task
    return np.asarray(out, np.float32)
