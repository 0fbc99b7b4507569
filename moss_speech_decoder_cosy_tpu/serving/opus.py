"""Minimal libopus bindings via ctypes.

The reference uses the Rust ``sphn`` opus codec on its websocket path
(server.py:3, client.py:5); here the native piece is the system libopus
driven directly through ctypes — host-side I/O, not a TPU concern
(SURVEY.md §2.10).

Packets are length-prefixed (uint16 BE) back-to-back — a simple reliable
framing for websocket transport (both ends are ours).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
from typing import Iterable, List, Optional

OPUS_APPLICATION_VOIP = 2048
OPUS_APPLICATION_AUDIO = 2049
OPUS_GET_LOOKAHEAD_REQUEST = 4027


def _load():
    name = ctypes.util.find_library("opus") or "libopus.so.0"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_encoder_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_int)]
    lib.opus_encode_float.restype = ctypes.c_int
    lib.opus_encode_float.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_int, ctypes.c_char_p,
                                      ctypes.c_int]
    lib.opus_encoder_ctl.restype = ctypes.c_int
    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_int)]
    lib.opus_decode_float.restype = ctypes.c_int
    lib.opus_decode_float.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_int, ctypes.c_int]
    return lib


_LIB = _load()


def available() -> bool:
    return _LIB is not None


class OpusEncoder:
    """Float PCM -> opus packets at a fixed frame size (20 ms default)."""

    def __init__(self, sample_rate: int = 24000, channels: int = 1,
                 frame_ms: int = 20):
        assert _LIB is not None, "libopus not found"
        err = ctypes.c_int(0)
        self.enc = _LIB.opus_encoder_create(sample_rate, channels,
                                            OPUS_APPLICATION_VOIP,
                                            ctypes.byref(err))
        assert err.value == 0, f"opus_encoder_create: {err.value}"
        self.frame = sample_rate * frame_ms // 1000
        self.channels = channels
        self._buf: List[float] = []

    def lookahead(self) -> int:
        """Encoder algorithmic delay in samples at the coding rate
        (OPUS_GET_LOOKAHEAD) — the Ogg Opus pre-skip source."""
        val = ctypes.c_int(0)
        # variadic fn without argtypes: wrap the handle explicitly so the
        # pointer is not truncated to a C int
        rc = _LIB.opus_encoder_ctl(ctypes.c_void_p(self.enc),
                                   ctypes.c_int(OPUS_GET_LOOKAHEAD_REQUEST),
                                   ctypes.byref(val))
        return val.value if rc == 0 else 0

    def encode_packets(self, pcm) -> List[bytes]:
        """Accumulate samples; return one raw opus packet per complete
        frame (no framing)."""
        self._buf.extend(float(x) for x in pcm)
        pkts: List[bytes] = []
        while len(self._buf) >= self.frame:
            chunk, self._buf = (self._buf[: self.frame],
                                self._buf[self.frame:])
            arr = (ctypes.c_float * len(chunk))(*chunk)
            dst = ctypes.create_string_buffer(4000)
            n = _LIB.opus_encode_float(self.enc, arr, self.frame, dst, 4000)
            assert n > 0, f"opus_encode_float: {n}"
            pkts.append(dst.raw[:n])
        return pkts

    def encode(self, pcm) -> bytes:
        """Accumulate samples; emit length-prefixed packets for every
        complete frame."""
        return b"".join(struct.pack(">H", len(p)) + p
                        for p in self.encode_packets(pcm))


class OpusDecoder:
    def __init__(self, sample_rate: int = 24000, channels: int = 1,
                 frame_ms: int = 20):
        assert _LIB is not None, "libopus not found"
        err = ctypes.c_int(0)
        self.dec = _LIB.opus_decoder_create(sample_rate, channels,
                                            ctypes.byref(err))
        assert err.value == 0
        self.max_frame = sample_rate * 120 // 1000
        self.channels = channels
        self._pending = b""

    def decode_packet(self, pkt: bytes) -> List[float]:
        """Decode ONE raw opus packet (no framing)."""
        buf = (ctypes.c_float * (self.max_frame * self.channels))()
        got = _LIB.opus_decode_float(self.dec, pkt, len(pkt), buf,
                                     self.max_frame, 0)
        assert got > 0, f"opus_decode_float: {got}"
        return list(buf[: got * self.channels])

    def decode(self, data: bytes) -> List[float]:
        """Consume length-prefixed packets, return decoded samples."""
        self._pending += data
        out: List[float] = []
        while len(self._pending) >= 2:
            n = struct.unpack(">H", self._pending[:2])[0]
            if len(self._pending) < 2 + n:
                break
            pkt, self._pending = (self._pending[2: 2 + n],
                                  self._pending[2 + n:])
            out.extend(self.decode_packet(pkt))
        return out
