from . import dist  # noqa: F401
from .dist import (DistSimulation, clear_fn_cache, from_blocked,  # noqa: F401
                   make_mesh, to_blocked)
