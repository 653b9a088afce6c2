from mtad_gat_tpu.graph.structure import (
    Graph,
    banded_edges,
    banded_graph,
    complete_graph,
    graph_from_edges,
    knn_edges_from_series,
    parse_graph_spec,
)
from mtad_gat_tpu.graph.segment import segment_softmax, segment_sum, segment_max
from mtad_gat_tpu.graph.ops import (
    gatv2_scores_dense,
    gatv1_scores_dense,
    gat_aggregate_dense,
    gatv2_scores_coo,
    gatv1_scores_coo,
    gat_aggregate_coo,
    gatv2_banded_attention,
)

__all__ = [
    "Graph",
    "banded_edges",
    "banded_graph",
    "complete_graph",
    "graph_from_edges",
    "knn_edges_from_series",
    "parse_graph_spec",
    "segment_softmax",
    "segment_sum",
    "segment_max",
    "gatv2_scores_dense",
    "gatv1_scores_dense",
    "gat_aggregate_dense",
    "gatv2_scores_coo",
    "gatv1_scores_coo",
    "gat_aggregate_coo",
    "gatv2_banded_attention",
]
