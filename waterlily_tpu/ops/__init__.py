from . import bc, grid, multigrid, poisson  # noqa: F401
