"""CLI argument surface.

Same 29 flags (names, types, defaults) as reference ``args.py:15-66`` so
existing reference invocations work unchanged, plus TPU-native extensions
(--seed, --compute_dtype, --attention_impl, --data_root, --output_root).
"""

from __future__ import annotations

import argparse

from mtad_gat_tpu.config import RunConfig


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()

    # -- Data params ---
    parser.add_argument("--dataset", type=str.upper, default="SMD")
    parser.add_argument("--group", type=str, default="1-1",
                        help="Required for SMD dataset. <group_index>-<index>")
    parser.add_argument("--lookback", type=int, default=100)
    parser.add_argument("--normalize", type=str2bool, default=True)
    parser.add_argument("--spec_res", type=str2bool, default=False)

    # -- Model params ---
    parser.add_argument("--kernel_size", type=int, default=7)
    parser.add_argument("--use_gatv2", type=str2bool, default=True)
    parser.add_argument("--feat_gat_embed_dim", type=int, default=None)
    parser.add_argument("--time_gat_embed_dim", type=int, default=None)
    parser.add_argument("--gru_n_layers", type=int, default=1)
    parser.add_argument("--gru_hid_dim", type=int, default=150)
    parser.add_argument("--fc_n_layers", type=int, default=3)
    parser.add_argument("--fc_hid_dim", type=int, default=150)
    parser.add_argument("--recon_n_layers", type=int, default=1)
    parser.add_argument("--recon_hid_dim", type=int, default=150)
    parser.add_argument("--alpha", type=float, default=0.2)

    # --- Train params ---
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--val_split", type=float, default=0.1)
    parser.add_argument("--bs", type=int, default=256)
    parser.add_argument("--init_lr", type=float, default=1e-3)
    parser.add_argument("--shuffle_dataset", type=str2bool, default=True)
    parser.add_argument("--dropout", type=float, default=0.3)
    parser.add_argument("--use_cuda", type=str2bool, default=True)
    parser.add_argument("--print_every", type=int, default=1)
    parser.add_argument("--log_tensorboard", type=str2bool, default=True)

    # --- Predictor params ---
    parser.add_argument("--scale_scores", type=str2bool, default=False)
    parser.add_argument("--use_mov_av", type=str2bool, default=False)
    parser.add_argument("--gamma", type=float, default=1.0)
    parser.add_argument("--level", type=float, default=None)
    parser.add_argument("--q", type=float, default=None)
    parser.add_argument("--dynamic_pot", type=str2bool, default=False)

    # --- Other ---
    parser.add_argument("--comment", type=str, default="")

    # --- TPU-native extensions ---
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--attention_impl", type=str, default="dense",
                        choices=["dense", "sparse", "pallas", "ring"])
    parser.add_argument("--gru_impl", type=str, default="auto",
                        choices=["auto", "xla", "pallas"],
                        help="GRU recurrent scan: 'auto' (default) picks the "
                             "measured per-regime winner — xla lax.scan at "
                             "the flagship window, the fused pallas kernel "
                             "at windows >= 1024 (+43% at lookback 8192; "
                             "docs/PERFORMANCE.md)")
    parser.add_argument("--gru_unroll", type=int, default=4,
                        help="lax.scan unroll for the GRU chains (4 = "
                             "measured sweet spot across lookbacks; "
                             "docs/PERFORMANCE.md)")
    parser.add_argument("--feature_graph", type=str, default="complete",
                        help="feature-GAT topology: 'complete' (reference "
                             "semantics) or 'knn:K' (k most-|corr|-related "
                             "features, computed from the train series)")
    parser.add_argument("--temporal_graph", type=str, default="complete",
                        help="temporal-GAT topology: 'complete' (reference "
                             "semantics) or 'band:W' (timestamps within "
                             "+/-W steps)")
    parser.add_argument("--bias_storage", type=str, default="full",
                        choices=["full", "band"],
                        help="temporal score-bias parameter storage: 'full' "
                             "(N,N) reference-style matrix, or 'band' (N,2W+1) "
                             "diagonal band of a band:W temporal graph — "
                             "O(N*W) memory, required for long lookbacks")
    parser.add_argument("--compile_cache", type=str, default="default",
                        help="persistent XLA compilation cache directory "
                             "('default' = ~/.cache/mtad_gat_tpu/xla, '' = "
                             "off); repeated runs skip the 20-100s first "
                             "compile")
    parser.add_argument("--data_root", type=str, default="datasets")
    parser.add_argument("--output_root", type=str, default="output")

    # --- Multi-chip / multi-host extensions (SURVEY.md §2.7) ---
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="devices in the training mesh: 0 = single-device "
                             "(no mesh), -1 = all visible devices, N = first N")
    parser.add_argument("--model_parallel", type=int, default=0,
                        help="model-axis size of the mesh (graph/sequence "
                             "partition); 0 = auto factorization")
    parser.add_argument("--coordinator", type=str, default="",
                        help="multi-host coordinator address host:port "
                             "(jax.distributed); empty = single-process/auto")
    parser.add_argument("--num_processes", type=int, default=0)
    parser.add_argument("--process_id", type=int, default=-1)

    # --- Production-training extensions ---
    parser.add_argument("--profile_dir", type=str, default="",
                        help="capture a jax.profiler trace of the first "
                             "post-compile epoch into this directory")
    parser.add_argument("--checkpoint_every", type=int, default=1,
                        help="epochs between full-resume checkpoints when "
                             "there is no val split (0 = end-of-run only, "
                             "the reference behavior)")
    parser.add_argument("--run_id", type=str, default="",
                        help="pin the run directory name (default: datetime)")
    parser.add_argument("--auto_resume", type=str2bool, default=False,
                        help="resume from run_id's train_state.msgpack when "
                             "present (preemption recovery; replays the "
                             "exact remaining epoch schedule)")

    return parser


def to_run_config(args: argparse.Namespace) -> RunConfig:
    return RunConfig.from_dict(vars(args))
