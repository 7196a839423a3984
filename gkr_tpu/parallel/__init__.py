from .sharding import ShardedBackend, make_mesh  # noqa: F401
