from .marching import marching_cubes  # noqa: F401
from .mesher import Mesher, MeshConfig  # noqa: F401
