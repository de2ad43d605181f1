from .mesh import make_mesh
from .sharded import ShardedFleetRec

__all__ = ["make_mesh", "ShardedFleetRec"]
