"""Text frontend tests: normalization, splitting, token batching."""

import numpy as np

from moss_speech_decoder_cosy_tpu.frontend import (
    TextFrontend, normalize_text, number_to_words, split_paragraph)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(17) == "seventeen"
    assert number_to_words(42) == "forty two"
    assert number_to_words(305) == "three hundred five"
    assert number_to_words(1200) == "one thousand two hundred"
    assert number_to_words(-3) == "minus three"


def test_normalize_text():
    assert normalize_text("I have $5 and 3 cats") == \
        "I have five dollars and three cats"
    assert normalize_text("growth of 12%") == "growth of twelve percent"
    assert "three point one four" in normalize_text("pi is 3.14")
    assert normalize_text('say  "hello"   world') == "say hello world"


def test_split_paragraph():
    text = ("This is one. This is two! Is this three? " * 3).strip()
    parts = split_paragraph(text, max_len=30)
    assert len(parts) >= 3
    assert all(len(p) <= 45 for p in parts)
    assert " ".join(parts).replace("  ", " ").startswith("This is one.")


def test_frontend_tokenization_and_spk_cache():
    fe = TextFrontend(tokenize_fn=lambda s: [ord(c) % 97 for c in s],
                      max_sentence_len=20)
    batches = fe.text_to_token_batches("One. Two three four. Five!")
    assert len(batches) >= 2
    for b in batches:
        assert b.ndim == 2 and b.dtype == np.int32
    fe.add_speaker("alice", object())
    assert fe.speaker("alice") is not None
