"""Import reference PyTorch checkpoints into this framework.

The reference trains single-device torch models and commits ``model.pt``
state_dicts (reference ``training.py:231-241``, e.g.
``output/MSL/27062021_111641/model.pt``). A user migrating from the reference
should be able to keep those trained weights, so this module maps a raw torch
``state_dict`` — no torch model class required — onto our flax parameter tree.

Layout differences handled here:

- torch ``Conv1d`` stores (out, in, kw); our NWC conv kernel is WIO (kw, in, out)
  (``nn/conv.py``).
- torch ``Linear`` stores (out, in) for a left-matmul; we store (in, out) for a
  right-matmul (``nn/heads.py:_TorchLinear``).
- torch ``GRU`` packs gates as rows of (3h, in); we store the transpose so the
  fused gate projection is a right-matmul (``nn/gru.py``). Gate order (r, z, n)
  is identical, so no reordering is needed.
- GAT attention vector ``a`` and the (N, N) score-bias matrix are stored with
  identical layouts on both sides (``nn/gat.py:_GATCore``).

Only torch's serialization reader is needed, and only inside
``load_torch_checkpoint``; the mapping itself is pure numpy so it is usable
from environments without torch (e.g. feeding arrays recovered elsewhere).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

__all__ = [
    "torch_state_dict_to_params",
    "params_to_torch_state_dict",
    "load_torch_checkpoint",
    "save_torch_checkpoint",
    "infer_model_dims",
]

_GRU_KEY = re.compile(r"(weight|bias)_(ih|hh)_l(\d+)$")


def _as_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch.Tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _as_numpy(sd[f"{prefix}.weight"]).T,
        "bias": _as_numpy(sd[f"{prefix}.bias"]),
    }


def _gru(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key in sd:
        if not key.startswith(prefix + "."):
            continue
        m = _GRU_KEY.search(key)
        if m is None:
            continue
        kind, side, layer = m.groups()
        arr = _as_numpy(sd[key])
        if kind == "weight":
            out[f"w_{side}_l{layer}"] = arr.T
        else:
            out[f"b_{side}_l{layer}"] = arr
    if not out:
        raise KeyError(f"no GRU weights found under {prefix!r}")
    return out


def _gat(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, dict]:
    core = {
        "lin_kernel": _as_numpy(sd[f"{prefix}.lin.weight"]).T,
        "lin_bias": _as_numpy(sd[f"{prefix}.lin.bias"]),
        "a": _as_numpy(sd[f"{prefix}.a"]),
    }
    if f"{prefix}.bias" in sd:
        core["bias"] = _as_numpy(sd[f"{prefix}.bias"])
    return {"core": core}


def _forecast(sd: Mapping[str, np.ndarray]) -> Dict[str, dict]:
    idxs = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"forecasting_model\.layers\.(\d+)\.weight$", k))
    )
    return {f"layers_{i}": _linear(sd, f"forecasting_model.layers.{i}") for i in idxs}


def torch_state_dict_to_params(sd: Mapping[str, np.ndarray]) -> Dict[str, dict]:
    """Map a reference MTAD-GAT torch ``state_dict`` (tensors or numpy arrays)
    to this framework's flax ``params`` tree (float32 numpy leaves)."""
    conv_w = _as_numpy(sd["conv.conv.weight"])  # (out, in, kw)
    params = {
        "conv": {
            "kernel": conv_w.transpose(2, 1, 0),
            "bias": _as_numpy(sd["conv.conv.bias"]),
        },
        "feature_gat": _gat(sd, "feature_gat"),
        "temporal_gat": _gat(sd, "temporal_gat"),
        "gru": _gru(sd, "gru.gru"),
        "forecasting_model": _forecast(sd),
        "recon_model": {
            "decoder": _gru(sd, "recon_model.decoder.rnn"),
            "fc": _linear(sd, "recon_model.fc"),
        },
    }

    def _f32(tree):
        if isinstance(tree, dict):
            return {k: _f32(v) for k, v in tree.items()}
        return np.asarray(tree, dtype=np.float32)

    return _f32(params)


def infer_model_dims(sd: Mapping[str, np.ndarray]) -> Dict[str, int]:
    """Recover the architecture hyper-parameters implied by a checkpoint's
    shapes — a sanity cross-check against the run's ``config.txt``."""
    n_features = _as_numpy(sd["conv.conv.bias"]).shape[0]
    kernel_size = _as_numpy(sd["conv.conv.weight"]).shape[2]
    window_size = _as_numpy(sd["temporal_gat.bias"]).shape[0]
    gru_hid = _as_numpy(sd["gru.gru.weight_hh_l0"]).shape[1]
    gru_layers = sum(1 for k in sd if re.match(r"gru\.gru\.weight_ih_l\d+$", k))
    recon_layers = sum(
        1 for k in sd if re.match(r"recon_model\.decoder\.rnn\.weight_ih_l\d+$", k)
    )
    fc_linears = sum(
        1 for k in sd if re.match(r"forecasting_model\.layers\.\d+\.weight$", k)
    )
    out_dim = _as_numpy(sd["forecasting_model.layers." f"{fc_linears - 1}" ".weight"]).shape[0]
    return {
        "n_features": n_features,
        "kernel_size": kernel_size,
        "window_size": window_size,
        "gru_hid_dim": gru_hid,
        "gru_n_layers": gru_layers,
        "recon_n_layers": recon_layers,
        "fc_n_layers": fc_linears - 1,  # reference counts hidden transforms
        "out_dim": out_dim,
    }


def params_to_torch_state_dict(params: Mapping[str, dict]) -> Dict[str, np.ndarray]:
    """The inverse mapping: our flax ``params`` tree -> a reference-layout
    torch ``state_dict`` (as numpy arrays), so models trained HERE can be
    loaded back into the reference implementation. Exact round-trip with
    :func:`torch_state_dict_to_params` (tested)."""
    p = params
    sd: Dict[str, np.ndarray] = {
        "conv.conv.weight": np.asarray(p["conv"]["kernel"]).transpose(2, 1, 0),
        "conv.conv.bias": np.asarray(p["conv"]["bias"]),
    }
    for name in ("feature_gat", "temporal_gat"):
        core = p[name]["core"]
        sd[f"{name}.lin.weight"] = np.asarray(core["lin_kernel"]).T
        sd[f"{name}.lin.bias"] = np.asarray(core["lin_bias"])
        sd[f"{name}.a"] = np.asarray(core["a"])
        if "bias" in core:
            sd[f"{name}.bias"] = np.asarray(core["bias"])

    def _gru_out(tree: Mapping[str, np.ndarray], prefix: str) -> None:
        for key, arr in tree.items():
            kind, side, layer = key.split("_", 2)  # w/b, ih/hh, lN
            torch_kind = "weight" if kind == "w" else "bias"
            arr = np.asarray(arr)
            sd[f"{prefix}.{torch_kind}_{side}_{layer}"] = (
                arr.T if kind == "w" else arr
            )

    _gru_out(p["gru"], "gru.gru")
    _gru_out(p["recon_model"]["decoder"], "recon_model.decoder.rnn")
    for name, lin in p["forecasting_model"].items():
        i = name.split("_")[1]
        sd[f"forecasting_model.layers.{i}.weight"] = np.asarray(lin["kernel"]).T
        sd[f"forecasting_model.layers.{i}.bias"] = np.asarray(lin["bias"])
    sd["recon_model.fc.weight"] = np.asarray(p["recon_model"]["fc"]["kernel"]).T
    sd["recon_model.fc.bias"] = np.asarray(p["recon_model"]["fc"]["bias"])
    return sd


def save_torch_checkpoint(params: Mapping[str, dict], path: str) -> None:
    """Write our params as a reference-loadable torch ``model.pt``."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v, dtype=np.float32))
        for k, v in params_to_torch_state_dict(params).items()
    }
    torch.save(sd, path)


def load_torch_checkpoint(path: str) -> Dict[str, dict]:
    """Read a reference ``model.pt`` and return our flax params tree."""
    import torch  # local import: torch is only needed to deserialize

    try:
        sd = torch.load(path, map_location="cpu")
    except Exception:
        # torch >= 2.6 defaults weights_only=True, which rejects checkpoints
        # saved as full modules (torch.save(model)); this is a migration
        # tool, so fall back to a full unpickle for those
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):  # a full module was saved, not a state_dict
        sd = sd.state_dict()
    return torch_state_dict_to_params(sd)
