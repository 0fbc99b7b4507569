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
# encoder CTLs (opus_defines.h)
OPUS_SET_BITRATE_REQUEST = 4002
OPUS_SET_COMPLEXITY_REQUEST = 4010
OPUS_SET_INBAND_FEC_REQUEST = 4012
OPUS_SET_PACKET_LOSS_PERC_REQUEST = 4014
OPUS_SET_DTX_REQUEST = 4016


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
    """Float PCM -> opus packets at a fixed frame size (20 ms default).

    Interop knobs (all optional; libopus supports 8/12/16/24/48 kHz input
    rates, so ``sample_rate=48000`` gives the full coded band):

    - ``bitrate``: target bits/s (default: libopus auto).
    - ``dtx``: discontinuous transmission — silence frames shrink to
      1-2 byte no-data packets.
    - ``fec`` + ``loss_perc``: in-band forward error correction; the
      decoder can reconstruct a lost frame from the NEXT packet via
      ``OpusDecoder.decode_fec``.
    - ``complexity``: 0-10 encoder effort.
    """

    def __init__(self, sample_rate: int = 24000, channels: int = 1,
                 frame_ms: int = 20, application: int = OPUS_APPLICATION_VOIP,
                 bitrate: Optional[int] = None, dtx: bool = False,
                 fec: bool = False, loss_perc: int = 0,
                 complexity: Optional[int] = None):
        assert _LIB is not None, "libopus not found"
        err = ctypes.c_int(0)
        self.enc = _LIB.opus_encoder_create(sample_rate, channels,
                                            application,
                                            ctypes.byref(err))
        assert err.value == 0, f"opus_encoder_create: {err.value}"
        self.frame = sample_rate * frame_ms // 1000
        self.channels = channels
        self._buf: List[float] = []
        if bitrate is not None:
            self._ctl(OPUS_SET_BITRATE_REQUEST, bitrate)
        if dtx:
            self._ctl(OPUS_SET_DTX_REQUEST, 1)
        if fec:
            self._ctl(OPUS_SET_INBAND_FEC_REQUEST, 1)
        if loss_perc:
            self._ctl(OPUS_SET_PACKET_LOSS_PERC_REQUEST, loss_perc)
        if complexity is not None:
            self._ctl(OPUS_SET_COMPLEXITY_REQUEST, complexity)

    def _ctl(self, request: int, value: int) -> None:
        # variadic fn without argtypes: wrap explicitly so the handle is
        # not truncated to a C int
        rc = _LIB.opus_encoder_ctl(ctypes.c_void_p(self.enc),
                                   ctypes.c_int(request),
                                   ctypes.c_int(value))
        assert rc == 0, f"opus_encoder_ctl({request}, {value}): {rc}"

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

    def decode_fec(self, next_pkt: bytes, frame_samples: int) -> List[float]:
        """Reconstruct a LOST frame from the FOLLOWING packet's in-band
        FEC data (encoder must have ``fec=True``; ``frame_samples`` is the
        duration of the lost frame).  Falls back to PLC synthesis when the
        packet carries no FEC."""
        buf = (ctypes.c_float * (frame_samples * self.channels))()
        got = _LIB.opus_decode_float(self.dec, next_pkt, len(next_pkt),
                                     buf, frame_samples, 1)
        assert got > 0, f"opus_decode_float(fec): {got}"
        return list(buf[: got * self.channels])

    def conceal(self, frame_samples: int) -> List[float]:
        """Packet-loss concealment: synthesize ``frame_samples`` samples
        for a lost packet with no FEC available (data=NULL PLC mode)."""
        buf = (ctypes.c_float * (frame_samples * self.channels))()
        got = _LIB.opus_decode_float(self.dec, None, 0, buf,
                                     frame_samples, 0)
        assert got > 0, f"opus_decode_float(plc): {got}"
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
