from . import hift, flow  # noqa: F401
