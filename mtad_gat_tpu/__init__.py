"""mtad_gat_tpu — a TPU-native framework for multivariate time-series anomaly
detection with graph attention (the MTAD-GAT model family).

Built from scratch on JAX/XLA/Pallas/pjit with the capabilities of the
reference implementation (ML4ITS/mtad-gat-pytorch):

- sliding-window data pipelines for SMD / SMAP / MSL (``mtad_gat_tpu.data``)
- the MTAD-GAT model family: 1-D temporal conv, feature-oriented and
  time-oriented graph attention (GATv1/GATv2), GRU encoder, joint
  forecasting + reconstruction heads (``mtad_gat_tpu.models``)
- general sparse graph primitives: SDDMM scoring, segment softmax, SpMM
  aggregation over COO edge lists, with non-complete topologies (k-NN
  feature graphs, banded temporal graphs) first-class through the model
  config (``mtad_gat_tpu.graph``)
- fused Pallas TPU kernels for the attention hot path (``mtad_gat_tpu.kernels``)
- a jit-compiled training runtime with on-device window gathering
  (``mtad_gat_tpu.training``)
- anomaly scoring and three thresholding methods: epsilon (Hundman),
  streaming peaks-over-threshold (SPOT), brute-force F1 search, evaluated
  under the point-adjust protocol — offline (``Predictor``) and as an
  online streaming serving path (``OnlineScorer``)
  (``mtad_gat_tpu.inference``)
- multi-chip scaling via jax.sharding meshes, explicit ring attention over
  ICI, a multi-host runtime (executed for real across OS processes in the
  test suite), and multi-entity batched training
  (``mtad_gat_tpu.parallel``, ``mtad_gat_tpu.training.multi_entity``)
- migration from the reference: trained torch ``model.pt`` checkpoints
  import directly (``mtad_gat_tpu.utils.torch_import``)
"""

from mtad_gat_tpu.version import __version__
from mtad_gat_tpu.config import MTADGATConfig, TrainConfig, PredictConfig, RunConfig

__all__ = [
    "__version__",
    "MTADGATConfig",
    "TrainConfig",
    "PredictConfig",
    "RunConfig",
]
