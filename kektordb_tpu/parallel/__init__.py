from .sharded import ShardedHNSW, make_mesh  # noqa: F401
