from .mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    time_sharding,
)
from .multihost import (
    barrier,
    broadcast_object,
    gather_objects,
    initialize_distributed,
    is_main_process,
)
