"""Data-prep tools — the reference tools/ directory rebuilt
(tools/extract_speech_token.py, extract_embedding.py,
make_parquet_list.py, rebatch.py).

Subcommands:
  extract_tokens    wav list -> speech tokens jsonl (thread-pooled IO,
                    batched TPU tokenization)
  make_parquet      utt2wav/text/tokens -> parquet shards + list file
"""

from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def extract_tokens(args):
    from ..eval.audio_io import read_wav, resample
    codec = _build_codec(args)

    def load(line):
        utt, path = line.strip().split(maxsplit=1)
        wav, sr = read_wav(path)
        return utt, resample(wav, sr, 16000)

    lines = [ln for ln in open(args.wav_scp) if ln.strip()]
    with open(args.output, "w") as out, ThreadPoolExecutor(8) as pool:
        for utt, wav in pool.map(load, lines):
            tokens = codec.encode(wav)[0].tolist()
            out.write(json.dumps({"utt": utt, "speech_token": tokens})
                      + "\n")
    print(f"wrote {args.output} ({len(lines)} utts)")


def make_parquet(args):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ..eval.audio_io import read_wav

    tokens = {}
    if args.token_jsonl:
        for ln in open(args.token_jsonl):
            rec = json.loads(ln)
            tokens[rec["utt"]] = rec["speech_token"]
    rows = []
    for ln in open(args.wav_scp):
        utt, path = ln.strip().split(maxsplit=1)
        wav, sr = read_wav(path)
        row = {"utt": utt, "speech": wav.tolist(), "sample_rate": sr}
        if utt in tokens:
            row["speech_token"] = tokens[utt]
        rows.append(row)
    os.makedirs(args.output_dir, exist_ok=True)
    paths = []
    per = args.num_utts_per_parquet
    for i in range(0, len(rows), per):
        p = os.path.join(args.output_dir, f"parquet_{i // per:09d}.tar")
        pq.write_table(pa.Table.from_pylist(rows[i:i + per]), p)
        paths.append(p)
    with open(os.path.join(args.output_dir, "data.list"), "w") as f:
        f.write("\n".join(paths) + "\n")
    print(f"wrote {len(paths)} shards to {args.output_dir}")


def rebatch(args):
    """Re-shard parquet files to a different utts-per-shard
    (tools/rebatch.py role)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = []
    for ln in open(args.input_list):
        ln = ln.strip()
        if ln:
            rows.extend(pq.read_table(ln).to_pylist())
    os.makedirs(args.output_dir, exist_ok=True)
    per = args.num_utts_per_parquet
    paths = []
    for i in range(0, len(rows), per):
        p = os.path.join(args.output_dir, f"parquet_{i // per:09d}.tar")
        pq.write_table(pa.Table.from_pylist(rows[i:i + per]), p)
        paths.append(p)
    with open(os.path.join(args.output_dir, "data.list"), "w") as f:
        f.write("\n".join(paths) + "\n")
    print(f"rebatched {len(rows)} rows into {len(paths)} shards")


def _build_codec(args):
    from .inference import build_codec
    ns = argparse.Namespace(
        flow_ckpt=None, hift_ckpt=None,
        tokenizer_ckpt=getattr(args, "tokenizer_ckpt", None),
        block_size=5, max_token_len=40, bf16=False)
    return build_codec(ns)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pe = sub.add_parser("extract_tokens")
    pe.add_argument("--wav_scp", required=True)
    pe.add_argument("--output", required=True)
    pe.add_argument("--tokenizer_ckpt", default=None)
    pm = sub.add_parser("make_parquet")
    pm.add_argument("--wav_scp", required=True)
    pm.add_argument("--token_jsonl", default=None)
    pm.add_argument("--output_dir", required=True)
    pm.add_argument("--num_utts_per_parquet", type=int, default=1000)
    pr = sub.add_parser("rebatch")
    pr.add_argument("--input_list", required=True)
    pr.add_argument("--output_dir", required=True)
    pr.add_argument("--num_utts_per_parquet", type=int, default=1000)
    args = p.parse_args()
    {"extract_tokens": extract_tokens,
     "make_parquet": make_parquet,
     "rebatch": rebatch}[args.cmd](args)


if __name__ == "__main__":
    main()
