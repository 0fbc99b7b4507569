from .dataset import DataList, build_pipeline  # noqa: F401
from . import processor  # noqa: F401
