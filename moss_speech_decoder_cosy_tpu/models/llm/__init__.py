from .qwen2 import Qwen2Config, Qwen2Model  # noqa: F401
from .speech_lm import SpeechLMConfig, Qwen2SpeechLM  # noqa: F401
