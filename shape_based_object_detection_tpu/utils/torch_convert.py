"""Torch state_dict -> flax params converter (component C21, SURVEY.md §2).

The parity path: pretrained/reference weights live in torch checkpoint files
(torchvision is not installed here — SURVEY.md §7); this walks the flax
variable tree and pulls each leaf from a torch state_dict whose module names
mirror the flax module names (the convention used by both our model zoo and
the golden torch models in tests/golden/torch_models.py).

Leaf mapping:
  Conv   kernel (kH, kW, I, O) <- torch weight (O, I, kH, kW), bias as-is
  BatchNorm  scale/bias <- weight/bias; batch_stats mean/var <- running_mean/var
  L2Norm scale <- scale (a bare Parameter)
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def torch_state_dict_to_flax(
    state_dict: Mapping[str, "object"], flax_variables: Dict
) -> Dict:
    """Returns a new variable dict with every leaf replaced from state_dict."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    used = set()

    def convert(path, leaf):
        names = [p.key for p in path]
        collection, mods, leaf_name = names[0], names[1:-1], names[-1]
        base = ".".join(mods)
        if collection == "params":
            if leaf_name == "kernel":
                key = f"{base}.weight"
                w = np.transpose(sd[key], (2, 3, 1, 0))
            elif leaf_name == "bias":
                key = f"{base}.bias"
                w = sd[key]
            elif leaf_name == "scale":
                # BatchNorm scale is torch `weight`; L2Norm keeps `scale`.
                key = f"{base}.weight" if f"{base}.weight" in sd else f"{base}.scale"
                w = sd[key]
            else:
                raise KeyError(f"unhandled param leaf {leaf_name} at {base}")
        elif collection == "batch_stats":
            key = f"{base}.running_mean" if leaf_name == "mean" else f"{base}.running_var"
            w = sd[key]
        else:
            raise KeyError(f"unhandled collection {collection}")
        used.add(key)
        assert w.shape == leaf.shape, (
            f"{key}: torch {w.shape} vs flax {leaf.shape} at {'/'.join(names)}")
        return jnp.asarray(w, dtype=leaf.dtype)

    out = jax.tree_util.tree_map_with_path(convert, flax_variables)
    return out


def flax_params_to_torch_state_dict(flax_variables: Dict) -> Dict[str, np.ndarray]:
    """Inverse direction (for exporting trained weights to torch consumers)."""
    flat = {}

    def visit(path, leaf):
        names = [p.key for p in path]
        collection, mods, leaf_name = names[0], names[1:-1], names[-1]
        base = ".".join(mods)
        arr = np.asarray(leaf)
        if collection == "params":
            if leaf_name == "kernel":
                flat[f"{base}.weight"] = np.transpose(arr, (3, 2, 0, 1))
            elif leaf_name == "bias":
                flat[f"{base}.bias"] = arr
            elif leaf_name == "scale":
                if arr.ndim == 1 and "norm" in base.lower() and "l2" in base.lower():
                    flat[f"{base}.scale"] = arr
                else:
                    flat[f"{base}.weight"] = arr
        elif collection == "batch_stats":
            suffix = "running_mean" if leaf_name == "mean" else "running_var"
            flat[f"{base}.{suffix}"] = arr
        return leaf

    jax.tree_util.tree_map_with_path(visit, flax_variables)
    return flat
