from . import interp, les, metrics  # noqa: F401
from .interp import interp_scalar, interp_vector, spread, squeeze
from .les import sgs, smagorinsky
from .metrics import (MeanFlow, ke_field, lambda2_field, omega_field,
                      omega_mag_field, pressure_force, pressure_moment,
                      total_force, total_moment, viscous_force, viscous_moment)
from .metrics import vorticity  # noqa: F401,E402
from . import viz  # noqa: F401,E402
from . import pathlines  # noqa: F401,E402
from . import mesh  # noqa: F401,E402
from .mesh import body_mesh, marching_tetrahedra, viz3d  # noqa: F401,E402
