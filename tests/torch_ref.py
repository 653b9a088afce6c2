"""Oracle helpers: load the reference PyTorch modules and map their weights
into our flax parameter trees for activation-allclose parity tests.

The reference repo is imported read-only as a test oracle (BASELINE.json north
star: "match the reference PyTorch per-layer activations (allclose)").
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np

REFERENCE = "/root/reference"

# Intra-reference bare-name imports (e.g. prediction.py does `from eval_methods
# import *`). Each dependency must be resolvable from sys.modules before the
# dependent module executes, so load_ref preloads them in topological order.
_REF_DEPS = {
    "prediction": ("eval_methods", "utils"),
    "eval_methods": ("spot",),
    "plotting": ("utils",),
    "preprocess": ("args",),
    "mtad_gat": ("modules",),
    "training": ("mtad_gat",),
}


def load_ref(name: str):
    """Import a reference module by explicit file path (never via sys.path).

    Registers the module in sys.modules under its bare name so the reference's
    own sibling imports resolve to it — deterministically, regardless of test
    execution order or any sys.path state (the round-4 order-dependence bug was
    `import preprocess` resolving to the repo-root CLI shim when another test
    had reordered sys.path).
    """
    mod = sys.modules.get(name)
    ref_file = os.path.join(REFERENCE, name + ".py")
    if mod is not None and getattr(mod, "__file__", None) == ref_file:
        return mod
    for dep in _REF_DEPS.get(name, ()):
        load_ref(dep)
    spec = importlib.util.spec_from_file_location(name, ref_file)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_modules():
    return load_ref("modules")


def ref_model():
    return load_ref("mtad_gat")


def _t(x) -> np.ndarray:
    return x.detach().cpu().numpy()


def map_conv(torch_conv) -> dict:
    # torch Conv1d weight (out, in, kw) -> WIO (kw, in, out)
    return {
        "kernel": _t(torch_conv.conv.weight).transpose(2, 1, 0),
        "bias": _t(torch_conv.conv.bias),
    }


def map_gat(torch_gat) -> dict:
    core = {
        "lin_kernel": _t(torch_gat.lin.weight).T,
        "lin_bias": _t(torch_gat.lin.bias),
        "a": _t(torch_gat.a),
    }
    if torch_gat.use_bias:
        core["bias"] = _t(torch_gat.bias)
    return {"core": core}


def map_gru_params(torch_gru, n_layers: int) -> dict:
    out = {}
    for layer in range(n_layers):
        out[f"w_ih_l{layer}"] = _t(getattr(torch_gru, f"weight_ih_l{layer}")).T
        out[f"w_hh_l{layer}"] = _t(getattr(torch_gru, f"weight_hh_l{layer}")).T
        out[f"b_ih_l{layer}"] = _t(getattr(torch_gru, f"bias_ih_l{layer}"))
        out[f"b_hh_l{layer}"] = _t(getattr(torch_gru, f"bias_hh_l{layer}"))
    return out


def map_forecast(torch_fc) -> dict:
    out = {}
    for i, lin in enumerate(torch_fc.layers):
        out[f"layers_{i}"] = {"kernel": _t(lin.weight).T, "bias": _t(lin.bias)}
    return out


def map_recon(torch_recon, n_layers: int) -> dict:
    return {
        "decoder": map_gru_params(torch_recon.decoder.rnn, n_layers),
        "fc": {"kernel": _t(torch_recon.fc.weight).T, "bias": _t(torch_recon.fc.bias)},
    }


def map_full_model(torch_model, gru_n_layers: int, recon_n_layers: int) -> dict:
    return {
        "conv": map_conv(torch_model.conv),
        "feature_gat": map_gat(torch_model.feature_gat),
        "temporal_gat": map_gat(torch_model.temporal_gat),
        "gru": map_gru_params(torch_model.gru.gru, gru_n_layers),
        "forecasting_model": map_forecast(torch_model.forecasting_model),
        "recon_model": map_recon(torch_model.recon_model, recon_n_layers),
    }
