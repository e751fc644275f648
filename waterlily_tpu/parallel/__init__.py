from . import dist  # noqa: F401
from .dist import DistSimulation, from_blocked, make_mesh, to_blocked  # noqa: F401
