"""Data pipeline tests: parquet round-trip through the full processor
chain into padded train batches."""

import functools
import numpy as np
import pytest

from moss_speech_decoder_cosy_tpu.data import (DataList, build_pipeline,
                                               processor)


@pytest.fixture(scope="module")
def parquet_shards(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    tmp = tmp_path_factory.mktemp("shards")
    rng = np.random.RandomState(0)
    paths = []
    for shard in range(2):
        rows = []
        for i in range(4):
            sr = 16000
            wav = (rng.randn(sr) * 0.1).astype(np.float32)
            rows.append({
                "utt": f"utt_{shard}_{i}",
                "speech": wav.tolist(),
                "sample_rate": sr,
                "speech_token": rng.randint(0, 64, 12).tolist(),
                "utt_embedding": rng.randn(8).astype(np.float32).tolist(),
                "spk_embedding": rng.randn(8).astype(np.float32).tolist(),
            })
        p = str(tmp / f"shard_{shard}.parquet")
        pq.write_table(pa.Table.from_pylist(rows), p)
        paths.append(p)
    return paths


def test_datalist_partition(parquet_shards):
    dl = DataList(parquet_shards * 4, rank=0, world_size=2)
    dl.set_epoch(0)
    items = list(dl)
    assert len(items) == 4                          # half of 8
    dl.set_epoch(1)
    items2 = [x["src"] for x in dl]
    assert len(items2) == 4


def test_full_chain_to_batches(parquet_shards):
    dl = DataList(parquet_shards, shuffle=False)
    dl.set_epoch(0)
    pipeline = build_pipeline(dl, [
        processor.parquet_opener,
        functools.partial(processor.filter_samples, max_length=10000),
        functools.partial(processor.resample, resample_rate=24000),
        functools.partial(processor.compute_fbank, n_fft=480,
                          hop_size=480, win_size=480),
        functools.partial(processor.compute_f0),
        processor.parse_embedding,
        functools.partial(processor.sort, sort_size=4),
        functools.partial(processor.static_batch, batch_size=4),
        functools.partial(processor.padding, gan=True, pad_to_multiple=8,
                          token_mel_ratio=4),
    ])
    batches = list(pipeline)
    assert len(batches) == 2
    b = batches[0]
    assert b["speech_token"].shape[0] == 4
    assert b["speech_feat"].shape[2] == 80
    assert b["speech_feat"].shape[1] % 8 == 0
    assert b["speech_token"].shape[1] * 4 == b["speech_feat"].shape[1]
    assert b["token_valid"].dtype == bool
    assert b["embedding"].shape == (4, 8)
    assert b["pitch_feat"].shape[:2] == b["speech_feat"].shape[:2]
    assert np.isfinite(b["speech_feat"]).all()


def test_dynamic_batch():
    data = [{"speech_feat": np.zeros((n, 4))} for n in (10, 12, 30, 5)]
    out = list(processor.dynamic_batch(iter(data), max_frames_in_batch=40))
    assert sum(len(b) for b in out) == 4
    for b in out:
        longest = max(x["speech_feat"].shape[0] for x in b)
        assert longest * len(b) <= 40 or len(b) == 1


def test_f0_tracker_finds_tone():
    sr = 24000
    t = np.arange(sr) / sr
    wav = 0.5 * np.sin(2 * np.pi * 220.0 * t)
    s = {"speech": wav.astype(np.float32),
         "speech_feat": np.zeros((50, 4), np.float32)}
    out = list(processor.compute_f0(iter([s]), sample_rate=sr))
    f0 = out[0]["pitch_feat"]
    voiced = f0[f0 > 0]
    assert len(voiced) > 20
    assert abs(np.median(voiced) - 220.0) < 8.0


def test_prefetcher():
    import time
    from moss_speech_decoder_cosy_tpu.data.dataset import Prefetcher

    def slow_gen():
        for i in range(5):
            time.sleep(0.01)
            yield i

    assert list(Prefetcher(slow_gen(), depth=2)) == [0, 1, 2, 3, 4]

    def failing():
        yield 1
        raise ValueError("boom")

    it = iter(Prefetcher(failing()))
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(it)


def test_indexed_tar_roundtrip(tmp_path):
    """data/tar.py: mmap member reads == tarfile reads; index sidecar is
    built on demand and reused (cosyvoice1/dataset/processor.py:126-156)."""
    import tarfile
    import pickle
    from moss_speech_decoder_cosy_tpu.data.tar import (
        IndexedTar, build_index)
    files = {f"f{i}.bin": bytes(range(i, i + 64)) for i in range(5)}
    tp = tmp_path / "shard.tar"
    with tarfile.open(tp, "w") as tf:
        for name, payload in files.items():
            import io as _io
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, _io.BytesIO(payload))
    t = IndexedTar(str(tp))
    assert sorted(t.names()) == sorted(files)
    for name, payload in files.items():
        assert t.read(name) == payload
    t.close()
    idx = tmp_path / "shard.index"
    assert idx.exists()
    entries = pickle.loads(idx.read_bytes())
    assert len(entries) == 5 and all(len(e) == 3 for e in entries)
    # explicit rebuild matches
    assert build_index(str(tp)) == str(idx)


def test_cosy_jsonl_opener(tmp_path):
    import io as _io
    import json
    import tarfile
    from moss_speech_decoder_cosy_tpu.data.processor import cosy_jsonl_opener
    from moss_speech_decoder_cosy_tpu.eval.audio_io import write_wav
    sr = 16000
    wavs = {}
    tp = tmp_path / "shard.tar"
    with tarfile.open(tp, "w") as tf:
        for i in range(3):
            name = f"utt{i}.wav"
            x = np.sin(np.arange(400) * 0.01 * (i + 1)).astype(np.float32)
            buf = _io.BytesIO()
            from scipy.io import wavfile
            wavfile.write(buf, sr, (x * 32767).astype(np.int16))
            payload = buf.getvalue()
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, _io.BytesIO(payload))
            wavs[name] = x
    jp = tmp_path / "shard.vq.jsonl"
    with open(jp, "w") as f:
        for i in range(3):
            f.write(json.dumps({"filename": f"utt{i}.wav",
                                "cosy_token": list(range(i + 2))}) + "\n")
    rows = list(cosy_jsonl_opener(iter([{"src": str(jp)}]),
                                  jsonl_suffix=".vq.jsonl"))
    assert len(rows) == 3
    for i, r in enumerate(rows):
        assert r["sample_rate"] == sr
        assert r["speech_token"].tolist() == list(range(i + 2))
        np.testing.assert_allclose(r["speech"], wavs[f"utt{i}.wav"],
                                   atol=1e-3)


def test_sft_npy_opener_split(tmp_path):
    from moss_speech_decoder_cosy_tpu.data.processor import sft_npy_opener
    from moss_speech_decoder_cosy_tpu.eval.audio_io import write_wav
    sr = 16000
    token_rate = 12.5
    wav = np.random.RandomState(0).randn(int(sr * 2)).astype(np.float32) * .1
    wp = tmp_path / "utt.wav"
    write_wav(str(wp), wav, sr)
    tokens = np.arange(25, dtype=np.int32)         # 2 s at 12.5 Hz
    npy = tmp_path / "utt.wav.vq0918-pool4.npy"
    np.save(npy, tokens)
    # whole-utterance mode
    rows = list(sft_npy_opener(iter([{"src": str(npy)}]),
                               npy_suffix=".vq0918-pool4.npy"))
    assert len(rows) == 1 and rows[0]["speech_token"].shape == (25,)
    # growing-prefix split every 10 tokens -> 3 samples, wav cut aligned
    rows = list(sft_npy_opener(iter([{"src": str(npy)}]),
                               npy_suffix=".vq0918-pool4.npy",
                               token_rate=token_rate, split_token=10))
    assert [len(r["speech_token"]) for r in rows] == [10, 20, 25]
    for r in rows:
        want = int(np.ceil(len(r["speech_token"]) / token_rate * sr))
        assert len(r["speech"]) == min(want, len(wav))
    # default '.npy' suffix on '<wav>.vqXXXX.npy' naming still finds the
    # wav (the intermediate vq tag is stripped automatically)
    rows = list(sft_npy_opener(iter([{"src": str(npy)}])))
    assert len(rows) == 1 and rows[0]["speech_token"].shape == (25,)


def test_compute_f0_quality_suite():
    """f0 tracker validation beyond a pure tone (the pyworld
    harvest/stonemask replacement): harmonic-rich signals without octave
    errors, vibrato tracking, unvoiced rejection."""
    from moss_speech_decoder_cosy_tpu.data.processor import compute_f0
    sr, hop = 24000, 480
    rng = np.random.RandomState(0)

    def track(wav):
        rows = list(compute_f0(iter([{"speech": wav}]),
                               sample_rate=sr, hop_size=hop))
        return rows[0]["pitch_feat"]

    t = np.arange(sr) / sr                       # 1 s
    # harmonic-rich: strong 2nd/3rd harmonics (octave-error bait)
    f_true = 180.0
    wav = (0.4 * np.sin(2 * np.pi * f_true * t)
           + 0.8 * np.sin(2 * np.pi * 2 * f_true * t)
           + 0.5 * np.sin(2 * np.pi * 3 * f_true * t)).astype(np.float32)
    f0 = track(wav)
    voiced = f0[5:-5][f0[5:-5] > 0]
    assert len(voiced) > 30
    err = np.abs(voiced - f_true) / f_true
    assert np.median(err) < 0.05, (np.median(err), np.median(voiced))

    # vibrato: 150 -> 250 Hz linear glide tracked within 8%
    f_inst = 150.0 + 100.0 * t
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    wav = np.sin(phase).astype(np.float32)
    f0 = track(wav)
    n = len(f0)
    centers = (np.arange(n) * hop) / sr
    want = 150.0 + 100.0 * centers
    sel = (f0 > 0) & (centers > 0.05) & (centers < 0.9)
    assert sel.sum() > 20
    rel = np.abs(f0[sel] - want[sel]) / want[sel]
    assert np.median(rel) < 0.08, np.median(rel)

    # white noise -> mostly unvoiced; silence -> all zero
    f0 = track((rng.randn(sr) * 0.1).astype(np.float32))
    assert (f0 > 0).mean() < 0.4
    assert (track(np.zeros(sr, np.float32)) == 0).all()


def test_indexed_tar_gnu_long_names(tmp_path):
    """Members with names >100 chars (GNU 'L' / PAX path records) index
    under their FULL name (advisor round 2: truncated-name lookups were
    silently dropping rows)."""
    import tarfile
    from moss_speech_decoder_cosy_tpu.data.tar import IndexedTar

    long_name = "d/" + "x" * 120 + ".txt"
    for fmt, tag in ((tarfile.GNU_FORMAT, "gnu"),
                     (tarfile.PAX_FORMAT, "pax")):
        tp = tmp_path / f"long_{tag}.tar"
        with tarfile.open(tp, "w", format=fmt) as tf:
            data = b"payload-" + tag.encode()
            info = tarfile.TarInfo(long_name)
            info.size = len(data)
            import io as _io
            tf.addfile(info, _io.BytesIO(data))
            info2 = tarfile.TarInfo("short.txt")
            info2.size = 5
            tf.addfile(info2, _io.BytesIO(b"abcde"))
        t = IndexedTar(str(tp))
        assert long_name in t.names(), (tag, t.names())
        assert t.read(long_name) == b"payload-" + tag.encode()
        assert t.read("short.txt") == b"abcde"
        t.close()
