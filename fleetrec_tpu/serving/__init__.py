from .ingest import IngestServer, Loadgen, build_native
from .engine import ServingEngine, LatencyStats

__all__ = ["IngestServer", "Loadgen", "build_native", "ServingEngine", "LatencyStats"]
