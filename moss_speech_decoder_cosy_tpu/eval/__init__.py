from .benchmark import run_seed_tts_benchmark, load_benchmark_data  # noqa: F401
from .rtf import measure_decode_rtf, measure_encode_rtf  # noqa: F401
from .audio_io import read_wav, write_wav  # noqa: F401
