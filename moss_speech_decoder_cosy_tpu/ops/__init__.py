from . import masks, activations, stft, convs, embeddings, attention  # noqa: F401
