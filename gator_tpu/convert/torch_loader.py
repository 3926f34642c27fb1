"""PyTorch checkpoint conversion (the four released GATOR checkpoints:
h36m[_det].pth.tar / 3dpw[_det].pth.tar — reference: README.md:99-108,
saved as {epoch, model_state_dict, ...} by lib/funcs_utils.py:110-118).

Maps every flax parameter/batch-stat leaf to its reference state-dict key
and transform (torch Linear weights are [out, in] -> flax kernels [in, out];
GraphLinear/MGCN/Conv1d tensors carry over directly). Conversion is exact:
all torch keys must be consumed, all flax leaves filled.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

# module names where a trailing _N is a torch ModuleList/Sequential index
_INDEXED = ("GLinear", "blocks", "linears")


def _torch_module_path(flax_path: Tuple[str, ...]) -> str:
    parts = []
    for name in flax_path:
        converted = None
        for base in _INDEXED:
            prefix = base + "_"
            if name.startswith(prefix) and name[len(prefix):].isdigit():
                converted = f"{base}.{name[len(prefix):]}"
                break
        parts.append(converted if converted else name)
    return ".".join(parts)


_EMBED_LEAVES = ("pos_id_embed", "pos_num_embed", "pos_j_id_embed",
                 "pos_v_id_embed", "spatial_pos_encoder")


def _leaf_rule(flax_path: Tuple[str, ...], leaf_name: str,
               collection: str) -> Tuple[str, str]:
    """-> (torch_key, transform) with transform in {none, transpose}."""
    if collection == "batch_stats":
        mod = _torch_module_path(flax_path)
        torch_name = {"mean": "running_mean", "var": "running_var"}[
            leaf_name]
        return f"{mod}.{torch_name}", "none"

    if flax_path and flax_path[-1] == "linear":
        # TorchDense: flax <mod>/linear/{kernel,bias} <-> torch
        # <mod>.{weight,bias}; torch Linear weight is [out, in]
        mod = _torch_module_path(flax_path[:-1])
        if leaf_name == "kernel":
            return f"{mod}.weight", "transpose"
        return f"{mod}.bias", "none"

    mod = _torch_module_path(flax_path)
    if leaf_name == "scale":   # LayerNorm / GroupNorm / BatchNorm
        return f"{mod}.weight", "none"
    if leaf_name in _EMBED_LEAVES:   # nn.Embedding tables
        return f"{mod}.{leaf_name}.weight" if mod else \
            f"{leaf_name}.weight", "none"
    # direct carries: W, b, M, adj2, bias, weight, a_2, b_2
    return f"{mod}.{leaf_name}", "none"


def _walk(tree: Dict[str, Any], path=()):
    for key, val in tree.items():
        if isinstance(val, dict):
            yield from _walk(val, path + (key,))
        else:
            yield path, key, val


def convert_state_dict(torch_state: Dict[str, np.ndarray],
                       flax_variables: Dict[str, Any],
                       strict: bool = True) -> Dict[str, Any]:
    """Fill a flax variables template ({'params': ..., 'batch_stats': ...})
    from a torch state dict (tensor values as numpy arrays)."""
    consumed = set()
    out: Dict[str, Any] = {}
    for collection, tree in flax_variables.items():
        new_tree: Dict[str, Any] = {}
        for path, leaf_name, leaf in _walk(tree):
            torch_key, transform = _leaf_rule(path, leaf_name, collection)
            if torch_key not in torch_state:
                raise KeyError(
                    f"torch checkpoint missing {torch_key} "
                    f"(for {collection}/{'/'.join(path)}/{leaf_name})")
            val = np.asarray(torch_state[torch_key])
            if transform == "transpose":
                val = val.T
            expected = np.asarray(leaf).shape
            if val.shape != expected:
                raise ValueError(
                    f"shape mismatch for {torch_key}: torch {val.shape} "
                    f"vs flax {expected}")
            node = new_tree
            for p in path:
                node = node.setdefault(p, {})
            node[leaf_name] = val.astype(np.asarray(leaf).dtype)
            consumed.add(torch_key)
        out[collection] = new_tree
    if strict:
        extra = {k for k in torch_state
                 if k not in consumed
                 and not k.endswith("num_batches_tracked")
                 and not _is_buffer(k)}
        if extra:
            raise KeyError(f"unconsumed torch keys: {sorted(extra)[:10]}"
                           f" (+{max(0, len(extra) - 10)} more)")
    return out


def _is_buffer(key: str) -> bool:
    """Non-parameter reference buffers baked into our asset tables."""
    buffer_names = ("graph_adj", "init_vertices", "init_vertices_6890",
                    "adj", "spatial", "spatial_pos", "edg_adj")
    leaf = key.split(".")[-1]
    return leaf in buffer_names


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth.tar and return model_state_dict as numpy.

    DataParallel-trained checkpoints carry a `module.` prefix on every key;
    it is stripped here (the reference does this with check_data_pararell,
    lib/funcs_utils.py:64-69)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state_dict", ckpt)
    out = {}
    for k, v in state.items():
        if not hasattr(v, "detach"):
            continue
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def convert_checkpoint(path: str, flax_variables: Dict[str, Any],
                       strict: bool = True) -> Dict[str, Any]:
    return convert_state_dict(load_torch_checkpoint(path), flax_variables,
                              strict=strict)


def export_state_dict(flax_variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax variables -> torch-style state dict (for
    round-trip tests and for users moving back to the reference)."""
    out: Dict[str, np.ndarray] = {}
    for collection, tree in flax_variables.items():
        for path, leaf_name, leaf in _walk(tree):
            torch_key, transform = _leaf_rule(path, leaf_name, collection)
            val = np.asarray(leaf)
            if transform == "transpose":
                val = val.T
            out[torch_key] = val
    return out
