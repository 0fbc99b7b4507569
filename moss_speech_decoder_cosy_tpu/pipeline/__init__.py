from .audio_decoder import AudioDecoder, StreamSession  # noqa: F401
from .stream_v1 import StreamSessionV1  # noqa: F401
