"""MTAD-GAT flagship model.

Composition matches the reference (``mtad_gat.py:64-79``):

    conv -> {feature GAT, temporal GAT} in parallel
         -> concat [x, h_feat, h_temp] (b, n, 3k)
         -> GRU -> h_end (b, gru_hid)
         -> forecasting MLP (b, out_dim)  +  reconstruction decoder (b, n, out_dim)

returning ``(predictions, reconstructions)``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mtad_gat_tpu.config import MTADGATConfig
from mtad_gat_tpu.nn import (
    FeatureAttention,
    ForecastingHead,
    GRU,
    ReconstructionHead,
    TemporalAttention,
    TemporalConv,
)
from mtad_gat_tpu.parallel.sharding import constrain

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


class MTADGAT(nn.Module):
    config: MTADGATConfig

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        c = self.config
        cd = _DTYPES[c.compute_dtype]
        x = constrain(x.astype(cd), "data", None, None)

        x = TemporalConv(
            n_features=c.n_features, kernel_size=c.kernel_size,
            compute_dtype=cd, name="conv",
        )(x)

        feat_cls, temp_cls = FeatureAttention, TemporalAttention
        if c.remat_attention:
            # trade recompute for HBM: the GAT score tensors are the largest
            # training-time residuals at long windows
            feat_cls = nn.remat(FeatureAttention, static_argnums=(2,))
            temp_cls = nn.remat(TemporalAttention, static_argnums=(2,))

        h_feat = feat_cls(
            n_features=c.n_features, window_size=c.window_size,
            dropout=c.dropout, alpha=c.alpha, embed_dim=c.feat_gat_embed_dim,
            use_gatv2=c.use_gatv2, impl=c.attention_impl, compute_dtype=cd,
            graph_spec=c.feature_graph, edges=c.feature_edges,
            name="feature_gat",
        )(x, deterministic)

        h_temp = temp_cls(
            n_features=c.n_features, window_size=c.window_size,
            dropout=c.dropout, alpha=c.alpha, embed_dim=c.time_gat_embed_dim,
            use_gatv2=c.use_gatv2, impl=c.attention_impl, compute_dtype=cd,
            graph_spec=c.temporal_graph, bias_storage=c.bias_storage,
            name="temporal_gat",
        )(x, deterministic)

        h_cat = jnp.concatenate([x, h_feat, h_temp], axis=2)  # (b, n, 3k)
        h_cat = constrain(h_cat, "data", None, None)

        _, h_end = GRU(
            in_dim=3 * c.n_features, hid_dim=c.gru_hid_dim,
            n_layers=c.gru_n_layers, dropout=c.dropout, compute_dtype=cd,
            collect_outputs=False,  # only h_end is consumed (mtad_gat.py:73-74)
            impl=c.resolved_gru_impl(), unroll=c.gru_unroll,
            name="gru",
        )(h_cat, deterministic=deterministic)

        predictions = ForecastingHead(
            in_dim=c.gru_hid_dim, hid_dim=c.forecast_hid_dim, out_dim=c.out_dim,
            n_layers=c.forecast_n_layers, dropout=c.dropout, compute_dtype=cd,
            name="forecasting_model",
        )(h_end, deterministic=deterministic)

        recons = ReconstructionHead(
            window_size=c.window_size, in_dim=c.gru_hid_dim,
            hid_dim=c.recon_hid_dim, out_dim=c.out_dim,
            n_layers=c.recon_n_layers, dropout=c.dropout, compute_dtype=cd,
            gru_impl=c.resolved_gru_impl(), gru_unroll=c.gru_unroll,
            name="recon_model",
        )(h_end, deterministic=deterministic)

        return predictions, recons
