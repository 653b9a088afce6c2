"""Configuration system.

Covers the full flag surface of the reference CLI (reference ``args.py:15-66``:
29 flags in data/model/train/predictor/other groups, same defaults) as typed
dataclasses with JSON round-trip (the reference persists ``config.txt`` JSON at
``train.py:170-172`` and reloads it at ``predict.py:53-55``), plus TPU-native
extensions (dtype policy, mesh shape, kernel selection) that have no reference
counterpart.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple


def _asdict(obj) -> Dict[str, Any]:
    return dataclasses.asdict(obj)


# gru_impl="auto" switches to the fused Pallas GRU scan at this window size:
# measured crossover (bench_long.py --gru, docs/PERFORMANCE.md) — tie at the
# flagship window 100, +8%/+31%/+43% at lookback 1024/4096/8192.
GRU_PALLAS_MIN_WINDOW = 1024


@dataclass
class MTADGATConfig:
    """Model hyper-parameters (reference ``args.py:26-42`` model group and
    ``mtad_gat.py:37-62`` constructor)."""

    n_features: int = 38
    window_size: int = 100          # --lookback
    out_dim: int = 38
    kernel_size: int = 7
    use_gatv2: bool = True
    feat_gat_embed_dim: Optional[int] = None
    time_gat_embed_dim: Optional[int] = None
    gru_n_layers: int = 1
    gru_hid_dim: int = 150
    forecast_n_layers: int = 3      # --fc_n_layers
    forecast_hid_dim: int = 150     # --fc_hid_dim
    recon_n_layers: int = 1
    recon_hid_dim: int = 150
    dropout: float = 0.3
    alpha: float = 0.2              # leaky-relu negative slope

    # --- TPU-native extensions (no reference counterpart) ---
    # Compute dtype for the forward pass ("float32" or "bfloat16"); params
    # always live in float32.
    compute_dtype: str = "float32"
    # Attention implementation: "dense" (XLA einsum, the oracle path),
    # "pallas" (fused blockwise kernel), "sparse" (COO SDDMM/SpMM path), or
    # "ring" (sequence/context-parallel blockwise attention over the mesh's
    # model axis; falls back to dense math when no model-parallel mesh is
    # active — the single-shard specialization).
    attention_impl: str = "dense"
    # Rematerialize the GAT layers in the backward pass (trade FLOPs for HBM;
    # useful for long windows / large node counts).
    remat_attention: bool = False
    # GRU recurrent-scan implementation: "auto" (default), "xla" (lax.scan)
    # or "pallas" (fused single-launch kernel, kernels/gru_pallas.py).
    # "auto" picks by regime from the measured sweep (docs/PERFORMANCE.md
    # long-window GRU table): at the flagship window 100 the two tie, so
    # xla; at window >= GRU_PALLAS_MIN_WINDOW the fused kernel wins
    # +8%/+31%/+43% at lookback 1024/4096/8192, so pallas.
    gru_impl: str = "auto"
    # lax.scan unroll factor for both GRU chains (encoder + recon decoder).
    # 4 is the measured fwd+bwd sweet spot at the flagship lookback 100 AND
    # at lookback 1024-8192 (docs/PERFORMANCE.md long-window GRU sweep);
    # exposed for per-regime tuning.
    gru_unroll: int = 4
    # Graph topology specs (SURVEY.md §7 north star: the complete graph is
    # ONE instantiation of the general SDDMM -> segment-softmax -> SpMM
    # pipeline). Non-complete topologies route through the COO sparse path.
    #   feature_graph:  "complete" | "knn:K"  (k most |corr|-related features;
    #                   needs feature_edges, computed from the train series)
    #   temporal_graph: "complete" | "band:W" (timestamp i attends |i-j|<=W)
    feature_graph: str = "complete"
    temporal_graph: str = "complete"
    # Static COO (src, dst) edge tuples for data-driven feature graphs
    # (from graph.knn_edges_from_series); JSON round-trips as nested lists,
    # normalized back to hashable tuples here.
    feature_edges: Optional[Tuple[Tuple[int, ...], Tuple[int, ...]]] = None
    # Temporal-GAT score-bias parameter storage. "full" keeps the reference's
    # (N, N) learnable matrix (modules.py:160-161) — param tree identical
    # across topologies. "band" stores only the (N, 2W+1) diagonal band of a
    # band:W temporal graph: O(N·W) parameter + optimizer state instead of
    # O(N²), which is what makes lookback 4096/8192 trainable (a full bias at
    # N=8192 alone is 256 MB of params + 512 MB of Adam state).
    bias_storage: str = "full"

    def __post_init__(self):
        # a typo'd impl would otherwise silently fall through to "dense"
        # inside _GATCore's dispatch
        if self.attention_impl not in ("dense", "sparse", "pallas", "ring"):
            raise ValueError(
                f"attention_impl must be dense|sparse|pallas|ring, "
                f"got {self.attention_impl!r}"
            )
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"compute_dtype must be float32|bfloat16, "
                f"got {self.compute_dtype!r}"
            )
        if self.gru_impl not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"gru_impl must be auto|xla|pallas, got {self.gru_impl!r}"
            )
        if self.gru_unroll < 1:
            raise ValueError(f"gru_unroll must be >= 1, got {self.gru_unroll}")
        from mtad_gat_tpu.graph.structure import parse_graph_spec

        fkind, _ = parse_graph_spec(self.feature_graph)
        tkind, _ = parse_graph_spec(self.temporal_graph)
        if fkind == "band":
            raise ValueError(
                "feature_graph must be 'complete' or 'knn:K' (banded topology "
                "only makes sense on the ordered temporal axis)"
            )
        if tkind == "knn":
            raise ValueError(
                "temporal_graph must be 'complete' or 'band:W' (k-NN topology "
                "is data-driven over features)"
            )
        if (
            self.attention_impl == "ring" and not self.use_gatv2
            and tkind != "band"
        ):
            raise ValueError(
                "attention_impl='ring' requires use_gatv2=True (the "
                "complete-graph ring path is GATv2-only; banded temporal "
                "graphs support both via halo exchange)"
            )
        if self.attention_impl == "pallas" and not self.use_gatv2:
            raise ValueError(
                "attention_impl='pallas' requires use_gatv2=True (the fused "
                "kernel implements GATv2 scoring only; with use_gatv2=False "
                "use 'dense' or 'sparse' — previously this combination "
                "silently ran the dense path)"
            )
        if (
            (fkind != "complete" or tkind != "complete")
            and self.attention_impl not in ("dense", "sparse", "ring")
        ):
            raise ValueError(
                "non-complete graph topologies run through the COO sparse, "
                "banded-dense, or halo paths; set attention_impl to "
                f"'dense', 'sparse', or 'ring' (got {self.attention_impl!r})"
            )
        if self.bias_storage not in ("full", "band"):
            raise ValueError(
                f"bias_storage must be full|band, got {self.bias_storage!r}"
            )
        if self.bias_storage == "band" and tkind != "band":
            raise ValueError(
                "bias_storage='band' stores the banded temporal score bias; "
                "it requires temporal_graph='band:W'"
            )
        if self.feature_edges is not None:
            src, dst = self.feature_edges
            self.feature_edges = (
                tuple(int(s) for s in src),
                tuple(int(d) for d in dst),
            )

    def resolved_gru_impl(self) -> str:
        """Resolve gru_impl="auto" by regime (measured, docs/PERFORMANCE.md
        "Long-window GRU sweep"): the fused Pallas scan wins at long windows
        (+43% at lookback 8192), ties at the flagship window 100."""
        if self.gru_impl != "auto":
            return self.gru_impl
        return "pallas" if self.window_size >= GRU_PALLAS_MIN_WINDOW else "xla"

    def feat_embed_dim(self) -> int:
        """Effective feature-GAT embed dim (doubled for GATv2, reference
        ``modules.py:41,47-48``)."""
        e = self.feat_gat_embed_dim if self.feat_gat_embed_dim is not None else self.window_size
        return 2 * e if self.use_gatv2 else e

    def time_embed_dim(self) -> int:
        """Effective temporal-GAT embed dim (reference ``modules.py:143,148-149``)."""
        e = self.time_gat_embed_dim if self.time_gat_embed_dim is not None else self.n_features
        return 2 * e if self.use_gatv2 else e


@dataclass
class TrainConfig:
    """Training-loop parameters (reference ``args.py:44-53`` train group)."""

    epochs: int = 30
    val_split: float = 0.1
    bs: int = 256
    init_lr: float = 1e-3
    shuffle_dataset: bool = True
    use_cuda: bool = True           # kept for config-surface parity; ignored on TPU
    print_every: int = 1
    log_tensorboard: bool = True
    seed: int = 0                   # TPU extension: everything is seeded

    # --- production-training extensions (defaults match the reference:
    # plain Adam at a constant lr, no clipping) ---
    grad_clip_norm: Optional[float] = None
    lr_schedule: str = "constant"   # "constant" | "cosine" | "warmup_cosine"
    lr_warmup_steps: int = 0
    lr_decay_steps: int = 10000
    # capture a jax.profiler device trace of the first post-compile epoch
    # into this directory (TensorBoard profile plugin / xprof format)
    profile_dir: str = ""
    # write the full-resume train_state checkpoint every N epochs even
    # without a validation split (failure recovery; the reference can only
    # reload weights for inference, SURVEY.md §5). 0 = reference behavior.
    checkpoint_every: int = 1


@dataclass
class PredictConfig:
    """Scoring / thresholding parameters (reference ``args.py:55-61``)."""

    scale_scores: bool = False
    use_mov_av: bool = False
    gamma: float = 1.0
    level: Optional[float] = None
    q: Optional[float] = None
    dynamic_pot: bool = False


@dataclass
class RunConfig:
    """Full run configuration = the reference's argparse namespace
    (``args.py:15-66``), JSON round-trippable like ``config.txt``."""

    dataset: str = "SMD"
    group: str = "1-1"
    lookback: int = 100
    normalize: bool = True
    spec_res: bool = False          # parsed-but-unused in the reference too (args.py:23)

    kernel_size: int = 7
    use_gatv2: bool = True
    feat_gat_embed_dim: Optional[int] = None
    time_gat_embed_dim: Optional[int] = None
    gru_n_layers: int = 1
    gru_hid_dim: int = 150
    fc_n_layers: int = 3
    fc_hid_dim: int = 150
    recon_n_layers: int = 1
    recon_hid_dim: int = 150
    alpha: float = 0.2

    epochs: int = 30
    val_split: float = 0.1
    bs: int = 256
    init_lr: float = 1e-3
    shuffle_dataset: bool = True
    dropout: float = 0.3
    use_cuda: bool = True
    print_every: int = 1
    log_tensorboard: bool = True

    scale_scores: bool = False
    use_mov_av: bool = False
    gamma: float = 1.0
    level: Optional[float] = None
    q: Optional[float] = None
    dynamic_pot: bool = False

    comment: str = ""

    # --- TPU-native extensions ---
    seed: int = 0
    compute_dtype: str = "float32"
    attention_impl: str = "dense"
    gru_impl: str = "auto"
    gru_unroll: int = 4
    data_root: str = "datasets"
    output_root: str = "output"
    # Graph topology (see MTADGATConfig): feature_edges is filled in by the
    # train CLI for knn specs (computed from the train series) and persisted
    # in config.txt so predict reloads the exact same graph.
    feature_graph: str = "complete"
    temporal_graph: str = "complete"
    feature_edges: Optional[List[List[int]]] = None
    bias_storage: str = "full"

    # --- Multi-chip / multi-host extensions (SURVEY.md §2.7) ---
    # mesh_devices: 0 = single-device (no mesh), -1 = all devices, N = first N
    mesh_devices: int = 0
    model_parallel: int = 0         # 0 = auto factorization
    coordinator: str = ""           # multi-host coordinator host:port
    num_processes: int = 0
    process_id: int = -1

    # --- Production-training extensions ---
    profile_dir: str = ""
    checkpoint_every: int = 1
    run_id: str = ""                # pin the run directory name ("" = datetime)
    auto_resume: bool = False       # resume from run_id's checkpoint if present

    # ------------------------------------------------------------------
    def model_config(self, n_features: int, out_dim: int) -> MTADGATConfig:
        return MTADGATConfig(
            n_features=n_features,
            window_size=self.lookback,
            out_dim=out_dim,
            kernel_size=self.kernel_size,
            use_gatv2=self.use_gatv2,
            feat_gat_embed_dim=self.feat_gat_embed_dim,
            time_gat_embed_dim=self.time_gat_embed_dim,
            gru_n_layers=self.gru_n_layers,
            gru_hid_dim=self.gru_hid_dim,
            forecast_n_layers=self.fc_n_layers,
            forecast_hid_dim=self.fc_hid_dim,
            recon_n_layers=self.recon_n_layers,
            recon_hid_dim=self.recon_hid_dim,
            dropout=self.dropout,
            alpha=self.alpha,
            compute_dtype=self.compute_dtype,
            attention_impl=self.attention_impl,
            gru_impl=self.gru_impl,
            gru_unroll=self.gru_unroll,
            feature_graph=self.feature_graph,
            temporal_graph=self.temporal_graph,
            feature_edges=(
                None if self.feature_edges is None
                else (tuple(self.feature_edges[0]), tuple(self.feature_edges[1]))
            ),
            bias_storage=self.bias_storage,
        )

    def train_config(self) -> TrainConfig:
        return TrainConfig(
            epochs=self.epochs,
            val_split=self.val_split,
            bs=self.bs,
            init_lr=self.init_lr,
            shuffle_dataset=self.shuffle_dataset,
            use_cuda=self.use_cuda,
            print_every=self.print_every,
            log_tensorboard=self.log_tensorboard,
            seed=self.seed,
            profile_dir=self.profile_dir,
            checkpoint_every=self.checkpoint_every,
        )

    def predict_config(self) -> PredictConfig:
        return PredictConfig(
            scale_scores=self.scale_scores,
            use_mov_av=self.use_mov_av,
            gamma=self.gamma,
            level=self.level,
            q=self.q,
            dynamic_pot=self.dynamic_pot,
        )

    # --- JSON round-trip (reference train.py:170-172 / predict.py:53-55) ---
    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "RunConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        if "gru_impl" not in kw:
            # config.txt saved before gru_impl existed: those checkpoints
            # trained (and calibrated their cached scores) with the XLA
            # scan — pin it rather than backfilling the "auto" default,
            # which would silently switch long-window runs to the
            # allclose-but-not-bit-identical Pallas GRU at predict/serve
            # and drift scores against their cached threshold calibration
            kw["gru_impl"] = "xla"
        return cls(**kw)

    @classmethod
    def load(cls, path: str) -> "RunConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))


# Per-dataset threshold-parameter tables, hardcoded in the reference entry
# scripts (train.py:126-143, predict.py:126-144).
LEVEL_Q_TABLE: Dict[str, Tuple[float, float]] = {
    "SMAP": (0.90, 0.005),
    "MSL": (0.90, 0.001),
    "SMD-1": (0.9950, 0.001),
    "SMD-2": (0.9925, 0.001),
    "SMD-3": (0.9999, 0.001),
}

REG_LEVEL_TABLE: Dict[str, int] = {
    "SMAP": 0,
    "MSL": 0,
    "SMD-1": 1,
    "SMD-2": 1,
    "SMD-3": 1,
}


def lookup_pot_params(dataset: str, group: str, level: Optional[float], q: Optional[float]):
    """Resolve (level, q, reg_level) like reference train.py:126-143."""
    key = "SMD-" + group[0] if dataset == "SMD" else dataset
    lvl, qq = LEVEL_Q_TABLE[key]
    if level is not None:
        lvl = level
    if q is not None:
        qq = q
    reg_level = REG_LEVEL_TABLE[key]
    return lvl, qq, reg_level
