"""Text frontend: normalization + prompt assembly.

The role of CosyVoiceFrontEnd (cosyvoice/cli/frontend.py:39-215).  The
reference delegates heavy normalization to external native libs
(ttsfrd / wetext); here a dependency-free normalizer covers the common
cases (numbers, currency/percent, whitespace/punctuation, paragraph
splitting a la frontend.py's split_paragraph), with a pluggable tokenizer
hook (any HF tokenizer works) and a speaker-info cache (spk2info).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional

import numpy as np

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALE = [(10 ** 9, "billion"), (10 ** 6, "million"), (10 ** 3, "thousand"),
          (100, "hundred")]


def number_to_words(n: int) -> str:
    """English number verbalization (the wetext/ttsfrd role for en)."""
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        tens, rest = divmod(n, 10)
        return _TENS[tens] + (" " + _ONES[rest] if rest else "")
    for value, name in _SCALE:
        if n >= value:
            head, rest = divmod(n, value)
            out = number_to_words(head) + " " + name
            if rest:
                out += " " + number_to_words(rest)
            return out
    return str(n)


def normalize_text(text: str) -> str:
    """Basic en normalization: currency, percent, decimals, integers,
    whitespace/punct cleanup."""
    text = text.strip()
    text = re.sub(r"\$(\d+(?:\.\d+)?)", lambda m: m.group(1) + " dollars",
                  text)
    text = re.sub(r"(\d+(?:\.\d+)?)%", lambda m: m.group(1) + " percent",
                  text)
    def _decimal(m):
        whole, frac = m.group(1), m.group(2)
        digits = " ".join(_ONES[int(d)] for d in frac)
        return f"{number_to_words(int(whole))} point {digits}"
    text = re.sub(r"(\d+)\.(\d+)", _decimal, text)
    text = re.sub(r"\d+", lambda m: number_to_words(int(m.group(0))), text)
    text = re.sub(r"[\"“”‘’]", "", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def split_paragraph(text: str, max_len: int = 80) -> List[str]:
    """Sentence-ish splitting with a length budget
    (frontend.py split_paragraph role)."""
    parts = re.split(r"(?<=[.!?;。！？；])\s*", text)
    out: List[str] = []
    buf = ""
    for p in parts:
        if not p:
            continue
        if buf and len(buf) + len(p) + 1 > max_len:
            out.append(buf.strip())
            buf = p
        else:
            buf = (buf + " " + p).strip()
    if buf:
        out.append(buf.strip())
    return out


class TextFrontend:
    """normalize -> split -> tokenize, plus the spk2info prompt cache.

    ``tokenize_fn``: text -> list[int] (plug any HF tokenizer's encode).
    """

    def __init__(self, tokenize_fn: Optional[Callable[[str], List[int]]]
                 = None, max_sentence_len: int = 80):
        self.tokenize_fn = tokenize_fn
        self.max_sentence_len = max_sentence_len
        self.spk2info: Dict[str, object] = {}

    def add_speaker(self, name: str, prompt) -> None:
        """Cache a prepared codec Prompt under a speaker id
        (frontend.py spk2info)."""
        self.spk2info[name] = prompt

    def speaker(self, name: str):
        return self.spk2info[name]

    def text_to_token_batches(self, text: str, split: bool = True
                              ) -> List[np.ndarray]:
        assert self.tokenize_fn is not None, "provide tokenize_fn"
        pieces = (split_paragraph(normalize_text(text),
                                  self.max_sentence_len)
                  if split else [normalize_text(text)])
        return [np.asarray(self.tokenize_fn(p), np.int32)[None]
                for p in pieces if p]
