from .mesh import make_mesh
from .planner import PlacementPlan, plan, split_table_columns, split_table_data
from .sharded import ShardedFleetRec

__all__ = [
    "make_mesh",
    "ShardedFleetRec",
    "PlacementPlan",
    "plan",
    "split_table_columns",
    "split_table_data",
]
