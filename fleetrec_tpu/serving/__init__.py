from .ingest import IngestServer, Loadgen, ScatterEgress, build_native
from .engine import ServingEngine, LatencyStats, PeerWatchdog
from .wire import IndexWireFormat
from .compose import ServeSpec, serve

__all__ = ["IngestServer", "Loadgen", "ScatterEgress", "build_native",
           "ServingEngine", "LatencyStats", "PeerWatchdog",
           "IndexWireFormat", "ServeSpec", "serve"]
