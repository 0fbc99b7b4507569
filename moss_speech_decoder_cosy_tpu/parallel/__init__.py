from .mesh import make_mesh, replicated, batch_sharded, zero_sharding  # noqa: F401
