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


def test_zh_number_to_words():
    from moss_speech_decoder_cosy_tpu.frontend import zh_number_to_words
    cases = {
        0: "零", 7: "七", 10: "十", 14: "十四", 20: "二十", 105: "一百零五",
        110: "一百一十", 1000: "一千", 1001: "一千零一", 9999: "九千九百九十九",
        10000: "一万", 100500: "十万零五百", 12345678: "一千二百三十四万五千六百七十八",
        200000005: "二亿零五", -42: "负四十二",
    }
    for n, want in cases.items():
        assert zh_number_to_words(n) == want, (n, zh_number_to_words(n))


def test_normalize_zh_pipeline():
    from moss_speech_decoder_cosy_tpu.frontend import (
        normalize_zh, contains_chinese)
    assert contains_chinese("你好 world")
    assert not contains_chinese("hello world")
    assert normalize_zh("共50人") == "共五十人"
    assert normalize_zh("增长3.5%") == "增长百分之三点五"
    assert normalize_zh("面积100²") == "面积一百平方"
    assert normalize_zh("他说 你 好") == "他说你好"     # CJK blank removal
    assert normalize_zh("价格-3元") == "价格负三元"
    assert normalize_zh("2024年") == "二零二四年"       # year digit reading
    assert normalize_zh("结束了，") == "结束了。"       # trailing comma
    assert normalize_zh("电话01234567890") == "电话零一二三四五六七八九零"


def test_split_paragraph_budget_zh_rules():
    from moss_speech_decoder_cosy_tpu.frontend import split_paragraph_budget
    # pack sentences until max; merge short tail into previous piece
    text = "一" * 50 + "。" + "二" * 40 + "。" + "三" * 5 + "。"
    out = split_paragraph_budget(text, "zh", token_max_n=80, token_min_n=40,
                                 merge_len=20)
    assert len(out) == 2
    assert out[0] == "一" * 50 + "。"
    assert out[1] == "二" * 40 + "。" + "三" * 5 + "。"
    # quote attaches to its sentence
    out = split_paragraph_budget('他说！"然后走了。', "zh",
                                 token_max_n=5, token_min_n=1, merge_len=0)
    assert out[0].startswith('他说！"')
    # missing terminal punctuation gets one
    out = split_paragraph_budget("没有结尾", "zh")
    assert out == ["没有结尾。"]


def test_cosy_frontend_modes():
    from moss_speech_decoder_cosy_tpu.frontend import CosyFrontend

    class FakeCodec:
        def prepare_prompt(self, w24, w16):
            import numpy as np
            from moss_speech_decoder_cosy_tpu.codec import Prompt
            return Prompt(np.ones((1, 4), np.int32),
                          np.zeros((1, 16, 80), np.float32),
                          np.zeros((1, 192), np.float32))

        def encode(self, w16):
            import numpy as np
            return np.arange(6, dtype=np.int32)[None]

    fe = CosyFrontend(tokenize_fn=lambda s: [ord(c) % 97 for c in s],
                      codec=FakeCodec())
    zs = fe.frontend_zero_shot("你好。", "提示。", object(), object())
    assert set(zs) == {"prompt", "prompt_text", "text"}
    cl = fe.frontend_cross_lingual("hello there.", object(), object())
    assert "prompt_text" not in cl and cl["llm_use_prompt_tokens"] is False
    it = fe.frontend_instruct("你好。", "用开心的语气说", object(), object())
    assert "prompt_text" in it and it["llm_use_prompt_tokens"] is False
    vc = fe.frontend_vc(object(), object(), object())
    assert vc["source_speech_token"].shape == (1, 6)
    # speaker cache path
    fe.add_zero_shot_spk("提示。", object(), object(), "spk1")
    zs2 = fe.frontend_zero_shot("你好。", "", zero_shot_spk_id="spk1")
    assert "prompt" in zs2 and "text" in zs2
    # zh/en normalize branches
    assert fe.text_normalize("共3人。你好。", split=False) == "共三人。你好。"
    assert "three" in fe.text_normalize("we have 3 cats.", split=False)


def test_normalize_zh_digit_ranges_not_negative():
    """'10-20' / '010-1234' read as two numbers, not a negative
    (advisor round 2: inter-digit hyphen is not a minus sign)."""
    from moss_speech_decoder_cosy_tpu.frontend import normalize_zh
    out = normalize_zh("10-20人")
    assert "负" not in out and "十" in out and "二十" in out
    out2 = normalize_zh("电话010-1234")
    assert "负" not in out2
    # a true negative still reads as one
    assert "负" in normalize_zh("气温-5度")
