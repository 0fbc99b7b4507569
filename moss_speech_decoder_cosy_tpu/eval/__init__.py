from .benchmark import run_seed_tts_benchmark, load_benchmark_data  # noqa: F401
from .rtf import (measure_decode_rtf, measure_encode_rtf,  # noqa: F401
                  measure_tokenizer_rtf)
from .audio_io import read_wav, write_wav  # noqa: F401
from .score import (edit_distance, word_error_rate,  # noqa: F401
                    speaker_similarity, make_asr_transcriber,
                    score_seed_tts_run, write_result_json)
