from .sharded import ShardedHNSW, make_mesh  # noqa: F401
from .distributed import (  # noqa: F401
    ReplicatedServing, init_distributed, local_devices_for_mesh,
    replica_mesh, replicate_stacked)
