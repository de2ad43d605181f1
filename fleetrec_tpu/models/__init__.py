from .embedding import PackedTables, pack_tables, lookup_concat
from .mlp import init_mlp_params, mlp_apply
from .fleetrec import FleetRecModel, init_model, forward

__all__ = [
    "PackedTables", "pack_tables", "lookup_concat",
    "init_mlp_params", "mlp_apply",
    "FleetRecModel", "init_model", "forward",
]
