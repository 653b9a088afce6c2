"""Graph containers.

The reference only ever uses *complete* graphs — all-pairs attention over k
feature nodes (``modules.py:97-122``) and n timestamp nodes
(``modules.py:195-217``). This framework generalizes to arbitrary COO edge
lists so the same SDDMM -> segment-softmax -> SpMM pipeline runs on sparse
graphs; the complete graph is just one instantiation (and the parity oracle).

Edges are stored destination-major and sorted by destination so that
per-destination segments are contiguous — that is what makes segment ops and
edge partitioning across mesh shards cheap on TPU (static shapes, monotone
segment ids).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Graph(NamedTuple):
    """COO edge list, sorted by ``dst`` (segment ids are ``dst``).

    senders/receivers follow message-passing convention: the edge (src -> dst)
    contributes src's features to dst's aggregation. For GAT attention over a
    row-softmax(dim=2) like the reference (``modules.py:89``), dst = i (query
    node), src = j (key node).
    """

    src: jax.Array   # (E,) int32
    dst: jax.Array   # (E,) int32
    n_nodes: int     # static

    @property
    def n_edges(self) -> int:
        return self.src.shape[0]


def complete_graph(n_nodes: int, self_loops: bool = True) -> Graph:
    """All-pairs graph matching the reference's dense attention (including
    self-loops: the reference concatenates v_i || v_i too, ``modules.py:101``)."""
    dst, src = np.meshgrid(np.arange(n_nodes), np.arange(n_nodes), indexing="ij")
    dst = dst.reshape(-1)
    src = src.reshape(-1)
    if not self_loops:
        keep = dst != src
        dst, src = dst[keep], src[keep]
    return Graph(
        src=jnp.asarray(src, jnp.int32),
        dst=jnp.asarray(dst, jnp.int32),
        n_nodes=n_nodes,
    )
