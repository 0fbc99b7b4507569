"""mmap-backed random-access tar reading for audio shards.

The TPU-native rebuild of the reference's MMTar/Tar pair
(cosyvoice1/dataset/processor.py:100-156): training shards ship as a plain
``.tar`` of wav files plus a pickled ``.index`` sidecar of (name, offset,
size) triples; readers mmap the tar and slice members without any per-file
syscalls or tarfile-module scanning.

Improvements over the reference:
- ``build_index`` creates the sidecar from a bare tar (the reference can
  only consume pre-built indices);
- header parsing handles GNU/star size padding and stops cleanly at the
  zero-block archive trailer;
- no torch/torchaudio dependency — members decode via eval.audio_io.
"""

from __future__ import annotations

import io
import mmap
import os
import pickle
from typing import Dict, List, Tuple

_BLOCK = 512


def _parse_octal(field: bytes) -> int:
    s = field.split(b"\x00", 1)[0].strip()
    return int(s, 8) if s else 0


class MMTar:
    """mmap view over a tar archive; O(1) member reads at known offsets."""

    def __init__(self, path: str):
        self._f = open(path, "rb")
        self._m = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)

    def close(self):
        try:
            self._m.close()
            self._f.close()
        except Exception:
            pass

    def __del__(self):
        self.close()

    def member_at(self, offset: int) -> Tuple[str, bytes]:
        """(name, payload bytes) for the member whose HEADER block starts
        at ``offset``."""
        hdr = self._m[offset: offset + _BLOCK]
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8")
        size = _parse_octal(hdr[124:136])
        start = offset + _BLOCK
        return name, self._m[start: start + size]

    def scan(self) -> List[Tuple[str, int, int]]:
        """Walk the archive: [(name, header_offset, size), ...] for regular
        files.  GNU long-name ('L') payloads and PAX ('x'/'g')
        ``path=`` records are APPLIED to the following member, so names
        longer than the 100-char tar field index correctly."""
        out = []
        off = 0
        n = len(self._m)
        pending_name = None
        while off + _BLOCK <= n:
            hdr = self._m[off: off + _BLOCK]
            if hdr == b"\x00" * _BLOCK:            # archive trailer
                break
            size = _parse_octal(hdr[124:136])
            typeflag = hdr[156:157]
            payload = self._m[off + _BLOCK: off + _BLOCK + size]
            if typeflag == b"L":                   # GNU longname
                pending_name = payload.rstrip(b"\x00").decode("utf-8")
            elif typeflag in (b"x", b"g"):         # PAX records
                for rec in payload.split(b"\n"):
                    if b" " in rec:
                        _, kv = rec.split(b" ", 1)
                        if kv.startswith(b"path="):
                            pending_name = kv[5:].decode("utf-8")
            elif typeflag in (b"0", b"\x00"):
                name = pending_name if pending_name is not None else \
                    hdr[0:100].split(b"\x00", 1)[0].decode("utf-8")
                out.append((name, off, size))
                pending_name = None
            else:
                pending_name = None
            off += _BLOCK + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
        return out


def build_index(tar_path: str, index_path: str = None) -> str:
    """Create the ``.index`` sidecar (pickled (name, offset, size) list)."""
    index_path = index_path or _index_path(tar_path)
    t = MMTar(tar_path)
    entries = t.scan()
    t.close()
    with open(index_path, "wb") as f:
        pickle.dump(entries, f)
    return index_path


def _index_path(tar_path: str) -> str:
    root, _ = os.path.splitext(tar_path)
    return root + ".index"


class IndexedTar:
    """Named random access: reads the ``.index`` sidecar (building it on
    the fly if absent) and serves members by name."""

    def __init__(self, tar_path: str):
        self._tar = MMTar(tar_path)
        ipath = _index_path(tar_path)
        if not os.path.exists(ipath):
            build_index(tar_path, ipath)
        with open(ipath, "rb") as f:
            entries = pickle.load(f)
        self._offsets: Dict[str, int] = {e[0]: e[1] for e in entries}

    def names(self):
        return list(self._offsets)

    def read(self, name: str) -> bytes:
        return self._tar.member_at(self._offsets[name])[1]

    def read_wav(self, name: str):
        """Decode a wav member -> (float32 samples, sample_rate)."""
        from ..eval.audio_io import read_wav_bytes
        return read_wav_bytes(io.BytesIO(self.read(name)))

    def close(self):
        self._tar.close()
