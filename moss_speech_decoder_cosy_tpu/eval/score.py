"""In-repo quality scoring for Seed-TTS runs: WER + speaker similarity.

The reference pipeline hands its synthesized wavs to the EXTERNAL
seed-tts-eval scorer and prints ``result.json``
(scripts/evaluate_moss_decoder.sh:76-94 — ``benchmark.sh ${OUTPUT_DIR}``
then ``cat ${OUTPUT_DIR}/result.json``).  This repo owns both scoring
models — the Whisper ASR decoder (tokenizer/asr_decoder.py, long-form
transcribe over speech tokens) and the CAM++ speaker embedder
(models/campplus.py) — so the same scores compute in-process:

- **WER**: corpus word/unit error rate of the transcribed ``pred.wav``
  against a reference unit sequence.  With ``text_to_units`` (a text
  tokenizer, available in real deployments) the reference is the sample's
  label text, like seed-tts-eval.  Without one (this environment ships no
  Whisper BPE vocab), the reference is the transcription of ``label.wav``
  through the SAME ASR — tokenizer-free, perfect synthesis still scores
  WER 0 and degradations show up as substitutions.
- **SIM**: cosine similarity between speaker embeddings of ``pred.wav``
  and the prompt utterance (seed-tts-eval's speaker-similarity protocol).

Scores aggregate the seed-tts-eval way: corpus WER = Σ edits / Σ ref
length; SIM = mean cosine.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np

from .audio_io import read_wav, resample


# --------------------------------------------------------------------------
# metrics
# --------------------------------------------------------------------------

def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance over arbitrary hashable units."""
    ref, hyp = list(ref), list(hyp)
    if not ref:
        return len(hyp)
    if not hyp:
        return len(ref)
    prev = np.arange(len(hyp) + 1)
    for i, r in enumerate(ref, 1):
        cur = np.empty(len(hyp) + 1, dtype=np.int64)
        cur[0] = i
        for j, h in enumerate(hyp, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (r != h))
        prev = cur
    return int(prev[-1])


def word_error_rate(ref: Sequence, hyp: Sequence) -> float:
    """Unit error rate = edits / len(ref) (1.0 when ref is empty and hyp
    is not; 0.0 when both are empty)."""
    if not len(ref):
        return 0.0 if not len(hyp) else 1.0
    return edit_distance(ref, hyp) / len(ref)


def speaker_similarity(a: np.ndarray, b: np.ndarray) -> float:
    """Cosine similarity between two speaker embeddings."""
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


# --------------------------------------------------------------------------
# in-repo transcriber
# --------------------------------------------------------------------------

def make_asr_transcriber(codec, asr) -> Callable[[np.ndarray], tuple]:
    """wav@16 kHz -> tuple of transcript token ids through the repo's own
    stack: SpeechCodec.encode (speech tokens) then WhisperASR.transcribe
    (text token ids, long-form stitched)."""

    def transcribe(wav_16k: np.ndarray) -> tuple:
        tokens = codec.encode(np.asarray(wav_16k, np.float32).reshape(-1))
        segs = asr.transcribe(tokens)
        if not segs:
            return ()
        return tuple(int(t) for t in np.concatenate(
            [np.asarray(s).reshape(-1) for s in segs]))

    return transcribe


# --------------------------------------------------------------------------
# run scorer
# --------------------------------------------------------------------------

def _prompt_wav_for(sample_dir: Path, benchmark_dir: Optional[str],
                    lang: str, sample_rate: int) -> Optional[np.ndarray]:
    """Prompt utterance @ run sample rate: from the benchmark layout when
    available, else recovered as the head of prompt_concat_pred.wav
    (benchmark.py writes concat(prompt_24k, pred))."""
    if benchmark_dir is not None:
        p = Path(benchmark_dir) / lang / sample_dir.name / "prompt.wav"
        if p.exists():
            wav, sr = read_wav(str(p))
            return resample(wav, sr, sample_rate)
    concat = sample_dir / "prompt_concat_pred.wav"
    pred = sample_dir / "pred.wav"
    if concat.exists() and pred.exists():
        cw, _ = read_wav(str(concat))
        pw, _ = read_wav(str(pred))
        n = len(cw.reshape(-1)) - len(pw.reshape(-1))
        if n > 0:
            return cw.reshape(-1)[:n]
    return None


def score_seed_tts_run(save_dir: str, lang: str,
                       transcribe_fn: Optional[Callable] = None,
                       speaker_fn: Optional[Callable] = None,
                       benchmark_dir: Optional[str] = None,
                       text_to_units: Optional[Callable] = None,
                       sample_rate: int = 24000) -> dict:
    """Score one language of a finished Seed-TTS run.

    ``transcribe_fn(wav_16k) -> sequence of units`` (see
    make_asr_transcriber); ``speaker_fn(wav_16k) -> embedding``.  Either
    may be None to skip that metric.  The WER reference per sample is
    ``text_to_units(label_text)`` when provided, else the transcription
    of ``label.wav`` (requires ``benchmark_dir``).

    Returns ``{"lang", "wer", "sim", "n", "per_sample"}`` with corpus WER
    (Σ edits / Σ ref len) and mean SIM; metrics that could not be
    computed are None.
    """
    root = Path(save_dir) / lang
    per_sample = {}
    tot_edits = tot_ref = 0
    sims = []
    n = 0
    for sample_dir in sorted(p for p in root.iterdir() if p.is_dir()) \
            if root.exists() else []:
        pred_path = sample_dir / "pred.wav"
        if not pred_path.exists():
            continue
        n += 1
        entry = {}
        pred_wav, sr = read_wav(str(pred_path))
        pred_16k = resample(pred_wav.reshape(-1), sr, 16000)
        if transcribe_fn is not None:
            ref_units = None
            if text_to_units is not None:
                meta = sample_dir / "metadata.json"
                if meta.exists():
                    label_text = json.loads(meta.read_text()).get(
                        "label_text", "")
                    ref_units = list(text_to_units(label_text))
            elif benchmark_dir is not None:
                lp = Path(benchmark_dir) / lang / sample_dir.name \
                    / "label.wav"
                if lp.exists():
                    lw, lsr = read_wav(str(lp))
                    ref_units = list(transcribe_fn(
                        resample(lw.reshape(-1), lsr, 16000)))
            if ref_units is not None:
                hyp = list(transcribe_fn(pred_16k))
                edits = edit_distance(ref_units, hyp)
                tot_edits += edits
                tot_ref += len(ref_units)
                entry["wer"] = (edits / len(ref_units) if ref_units
                                else (0.0 if not hyp else 1.0))
        if speaker_fn is not None:
            prompt = _prompt_wav_for(sample_dir, benchmark_dir, lang,
                                     sample_rate)
            if prompt is not None:
                prompt_16k = resample(np.asarray(prompt).reshape(-1),
                                      sample_rate, 16000)
                sim = speaker_similarity(speaker_fn(pred_16k),
                                         speaker_fn(prompt_16k))
                sims.append(sim)
                entry["sim"] = sim
        per_sample[sample_dir.name] = entry
    return {"lang": lang,
            "wer": (tot_edits / tot_ref) if tot_ref else None,
            "sim": float(np.mean(sims)) if sims else None,
            "n": n, "per_sample": per_sample}


def write_result_json(save_dir: str, lang_results: dict) -> str:
    """Merge per-lang scores into ``<save_dir>/result.json`` — the file
    the reference prints at the end of its eval pipeline
    (evaluate_moss_decoder.sh:85-94)."""
    path = Path(save_dir) / "result.json"
    existing = {}
    if path.exists():
        try:
            existing = json.loads(path.read_text())
        except (json.JSONDecodeError, OSError):
            existing = {}
    for lang, res in lang_results.items():
        existing[lang] = {"wer": res.get("wer"), "sim": res.get("sim"),
                          "n": res.get("n")}
    path.write_text(json.dumps(existing, indent=2))
    return str(path)
