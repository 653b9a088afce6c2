from mtad_gat_tpu.nn.conv import TemporalConv
from mtad_gat_tpu.nn.gat import FeatureAttention, TemporalAttention
from mtad_gat_tpu.nn.gru import GRU
from mtad_gat_tpu.nn.heads import ForecastingHead, ReconstructionHead

__all__ = [
    "TemporalConv",
    "FeatureAttention",
    "TemporalAttention",
    "GRU",
    "ForecastingHead",
    "ReconstructionHead",
]
