from . import mesh, ring_attention, sharded_table
from .mesh import TABLE_AXIS, make_mesh, replicated, table_sharding
from .sharded_table import (ExchangeState, create_sharded,
                            init_optimizer_sharded, local_shard,
                            sharded_apply_grads, sharded_lookup)
