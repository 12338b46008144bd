from .mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    time_sharding,
)
from .zero import (
    opt_state_bytes_per_device,
    shard_opt_state,
    zero1_constrain,
    zero1_sharding_for,
)
from .multihost import (
    barrier,
    broadcast_object,
    gather_objects,
    initialize_distributed,
    is_main_process,
)
