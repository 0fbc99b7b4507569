from .config import (  # noqa: F401
    WhisperVQConfig, glm4_voice_tokenizer_config, tiny_tokenizer_config)
from .model import WhisperVQEncoder, TokenizerStreamState  # noqa: F401
from .features import WhisperFeatureExtractor  # noqa: F401
