from .protocol import (  # noqa: F401
    KIND_HANDSHAKE, KIND_AUDIO, KIND_TEXT, FRAME_SAMPLES, frame_message,
    parse_message)
