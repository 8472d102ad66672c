from .mesh import make_mesh  # noqa: F401
from .sweep import ParameterSweep  # noqa: F401
from .spatial import make_spatial_runner  # noqa: F401
