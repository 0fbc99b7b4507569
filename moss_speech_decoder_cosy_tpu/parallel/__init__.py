from .mesh import make_mesh, replicated, batch_sharded, zero_sharding  # noqa: F401
from .tp import make_tp_mesh, tp_specs, tp_shard_params  # noqa: F401
