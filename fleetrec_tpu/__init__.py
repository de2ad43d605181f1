"""FleetRec-TPU: a TPU-native rebuild of the FleetRec disaggregated
GPU-FPGA recommendation inference system (fpgasystems/GPU-FPGA-
Recommendation-System, KDD'21) as a single JAX/XLA/Pallas serving engine.

The FPGA embedding stage becomes a packed-table gather over TPU HBM, the
100 Gbps TCP tier becomes ICI collectives over a jax.sharding Mesh, and the
GPU cuBLASLt scoring stage becomes an MXU matmul chain fused into the same
compiled program.
"""

from . import config, reference
from .config import CONFIGS, ModelConfig, MLPSpec, TableSpec, get_config
from .models import FleetRecModel, init_model

__version__ = "0.1.0"
