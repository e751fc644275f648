from . import sharding  # noqa: F401
from .sharding import (make_mesh, shard_flow_state, shard_levels,  # noqa: F401
                       shard_simulation, state_sharding)
