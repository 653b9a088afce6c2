from mtad_gat_tpu.data.windows import (
    num_windows,
    gather_windows,
    gather_targets,
    window_batch,
)
from mtad_gat_tpu.data.loading import (
    normalize_data,
    get_data,
    get_data_dim,
    get_target_dims,
    adjust_anomaly_scores,
)
from mtad_gat_tpu.data.synthetic import synthetic_series

__all__ = [
    "num_windows",
    "gather_windows",
    "gather_targets",
    "window_batch",
    "normalize_data",
    "get_data",
    "get_data_dim",
    "get_target_dims",
    "adjust_anomaly_scores",
    "synthetic_series",
]
