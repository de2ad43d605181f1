from .ingest import IngestServer, Loadgen, ScatterEgress, build_native
from .engine import ServingEngine, LatencyStats
from .wire import IndexWireFormat

__all__ = ["IngestServer", "Loadgen", "ScatterEgress", "build_native",
           "ServingEngine", "LatencyStats", "IndexWireFormat"]
