"""Convert between reference (torch) Str2Str checkpoints and flax params.

The reference publishes `pretrain.pth` — a raw ``{'state_dict': ...}`` with
``net.``-prefixed torch parameter names (reference checkpoint_utils.py:3-27).
This module maps that naming/layout onto the ScoreNetwork param pytree:

  torch ``Linear.weight`` is (out, in)  ->  flax ``kernel`` is (in, out): transpose
  torch ``LayerNorm.weight/bias``       ->  flax ``scale``/``bias``
  torch ``nn.TransformerEncoderLayer.self_attn.in_proj_weight`` (packed QKV)
                                        ->  ``self_attn/in_proj/kernel`` (transposed;
                                            our attention splits columns q,k,v in
                                            the same order)

The mapping is a bijection, so it also runs in REVERSE
(`flax_to_torch_state_dict`): given this framework's params and the target
torch net's parameter names, emit a state_dict the reference net loads —
used by the cross-framework quality-parity harness
(scripts/crossparity.py) to drive the reference `predict_step` with
TPU-trained weights.

Works on numpy arrays; torch is only needed to deserialize ``.pth`` files.
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

Path = Tuple[str, ...]


def _torch_name_to_path(name: str) -> Optional[Tuple[Path, bool]]:
    """Map one torch parameter name to (flax param path, transpose?).

    Returns None for unmapped names."""
    name = re.sub(r"^net\.", "", name)
    name = re.sub(r"^_orig_mod\.", "", name)  # torch.compile artifacts

    # ---- embedder ----------------------------------------------------
    m = re.match(r"embedder\.(node|edge)_embed\.(\d+)\.(weight|bias)$", name)
    if m:
        which, idx, kind = m.group(1), int(m.group(2)), m.group(3)
        base = ("embedder", f"{which}_embed")
        if idx == 0 and which == "edge":
            # Decomposed first layer: flat kernel/bias params.
            if kind == "weight":
                return base + ("linear_0_kernel",), True
            return base + ("linear_0_bias",), False
        if idx in (0, 2, 4):  # Linear layers of the Sequential
            leaf = "kernel" if kind == "weight" else "bias"
            return base + (f"linear_{idx // 2}", leaf), kind == "weight"
        # index 5: LayerNorm
        leaf = "scale" if kind == "weight" else "bias"
        return base + ("norm", leaf), False

    # ---- trunk modules -----------------------------------------------
    m = re.match(r"translator\.trunk\.([\w]+?)\.(.*)$", name)
    if m:
        module, rest = m.group(1), m.group(2)
        base = ("translator", module)

        # IPA blocks
        if module.startswith("ipa_ln_"):
            leaf = "scale" if rest == "weight" else "bias"
            return base + (leaf,), False
        if module.startswith("ipa_"):
            if rest == "head_weights":
                return base + ("head_weights",), False
            sub, kind = rest.rsplit(".", 1)
            leaf = "kernel" if kind == "weight" else "bias"
            return base + (sub, leaf), kind == "weight"

        if module.startswith("skip_embed_") or module.startswith("linear_"):
            leaf = "kernel" if rest == "weight" else "bias"
            return base + (leaf,), rest == "weight"

        if module.startswith("transformer_"):
            # rest like: layers.0.self_attn.in_proj_weight
            tm = re.match(r"layers\.(\d+)\.(.*)$", rest)
            if tm is None:
                return None
            li, sub = int(tm.group(1)), tm.group(2)
            lbase = base + (f"layers_{li}",)
            if sub == "self_attn.in_proj_weight":
                return lbase + ("self_attn", "in_proj", "kernel"), True
            if sub == "self_attn.in_proj_bias":
                return lbase + ("self_attn", "in_proj", "bias"), False
            if sub == "self_attn.out_proj.weight":
                return lbase + ("self_attn", "out_proj", "kernel"), True
            if sub == "self_attn.out_proj.bias":
                return lbase + ("self_attn", "out_proj", "bias"), False
            if sub in ("linear1.weight", "linear2.weight"):
                return lbase + (sub.split(".")[0], "kernel"), True
            if sub in ("linear1.bias", "linear2.bias"):
                return lbase + (sub.split(".")[0], "bias"), False
            if sub in ("norm1.weight", "norm2.weight"):
                return lbase + (sub.split(".")[0], "scale"), False
            if sub in ("norm1.bias", "norm2.bias"):
                return lbase + (sub.split(".")[0], "bias"), False
            return None

        if module.startswith("node_transition_"):
            sub, kind = rest.rsplit(".", 1)
            if sub == "ln":
                leaf = "scale" if kind == "weight" else "bias"
                return base + ("ln", leaf), False
            leaf = "kernel" if kind == "weight" else "bias"
            return base + (sub, leaf), kind == "weight"

        if module.startswith("bb_update_"):
            # rest: linear.weight / linear.bias
            kind = rest.split(".")[-1]
            leaf = "kernel" if kind == "weight" else "bias"
            return base + ("linear", leaf), kind == "weight"

        if module.startswith("edge_transition_"):
            # Our EdgeTransition decomposes the concat matmuls but keeps
            # the same kernel shapes as flat (in, out) parameters.
            em = re.match(r"initial_embed\.(weight|bias)$", rest)
            if em:
                leaf = "kernel" if em.group(1) == "weight" else "bias"
                return base + ("initial_embed", leaf), em.group(1) == "weight"
            em = re.match(r"final_layer\.(weight|bias)$", rest)
            if em:
                if em.group(1) == "weight":
                    return base + ("final_kernel",), True
                return base + ("final_bias",), False
            em = re.match(r"trunk\.(\d+)\.(weight|bias)$", rest)
            if em:  # Sequential [Linear, ReLU, Linear, ReLU] -> 0, 2
                i = int(em.group(1)) // 2
                if em.group(2) == "weight":
                    return base + (f"trunk_{i}_kernel",), True
                return base + (f"trunk_{i}_bias",), False
            em = re.match(r"layer_norm\.(weight|bias)$", rest)
            if em:
                leaf = "scale" if em.group(1) == "weight" else "bias"
                return base + ("layer_norm", leaf), False
            return None

        return None

    # ---- torsion head ------------------------------------------------
    m = re.match(r"translator\.torsion_pred\.(linear_\w+)\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("translator", "torsion_pred", m.group(1), leaf), m.group(2) == "weight"

    return None


def _set(tree: dict, path: tuple, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get(tree: dict, path: tuple) -> Optional[np.ndarray]:
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def torch_state_dict_to_flax(state_dict: Dict[str, np.ndarray]) -> dict:
    """Map torch parameter names to the ScoreNetwork flax param tree.

    Accepts names with or without the leading ``net.`` prefix.
    Returns {'params': ...} ready for `ScoreNetwork.apply`.
    """
    params: dict = {}
    unused = []
    for name, tensor in state_dict.items():
        mapped = _torch_name_to_path(name)
        if mapped is None:
            unused.append(name)
            continue
        path, transpose = mapped
        arr = np.asarray(tensor, dtype=np.float32)
        _set(params, path, arr.T if transpose else arr)

    if unused:
        raise ValueError(f"unmapped torch parameters: {unused[:10]}"
                         f" (+{max(0, len(unused) - 10)} more)")
    return {"params": params}


# Parameters the reference DEFINES but never uses in forward (dead weights):
# TorsionAngleHead.linear_3 (layers.py:194) is constructed with init="final"
# (zeros) and absent from TorsionAngleHead.forward (layers.py:199-213). This
# framework does not carry dead parameters, so the reverse conversion fills
# them with zeros — bit-identical to the reference's own initialization.
_DEAD_TORCH_KEYS = re.compile(
    r"^(net\.)?translator\.torsion_pred\.linear_3\.(weight|bias)$")


def flax_to_torch_state_dict(params: dict,
                             template: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse conversion: read this framework's param pytree into a torch
    state_dict matching `template` (typically `ref_net.state_dict()` of a
    freshly built reference net; values are used only for the shapes/dtypes
    of the reference's dead parameters).

    Every torch key must map onto a present flax leaf (or be a known dead
    reference parameter, filled with zeros), and every flax leaf must be
    consumed exactly once — a partial mapping would silently leave reference
    modules at random init.
    """
    tree = params.get("params", params)
    out: Dict[str, np.ndarray] = {}
    consumed = set()
    missing = []
    for name, tmpl in template.items():
        if _DEAD_TORCH_KEYS.match(name):
            out[name] = np.zeros(np.asarray(tmpl).shape, np.float32)
            continue
        mapped = _torch_name_to_path(name)
        if mapped is None:
            missing.append(name)
            continue
        path, transpose = mapped
        arr = _get(tree, path)
        if arr is None:
            missing.append(name)
            continue
        arr = np.asarray(arr, dtype=np.float32)
        out[name] = arr.T if transpose else arr
        consumed.add(path)
    if missing:
        raise ValueError(f"torch keys without a flax source: {missing[:10]}"
                         f" (+{max(0, len(missing) - 10)} more)")

    def leaves(node, prefix=()):
        if isinstance(node, dict):
            for k, v in node.items():
                yield from leaves(v, prefix + (k,))
        else:
            yield prefix

    # A flax tree produced by torch->flax conversion carries the reference's
    # dead linear_3 leaves; they map to the zero-filled dead torch keys.
    dead_paths = {("translator", "torsion_pred", "linear_3", "kernel"),
                  ("translator", "torsion_pred", "linear_3", "bias")}
    leftover = [p for p in leaves(tree)
                if p not in consumed and p not in dead_paths]
    if leftover:
        raise ValueError(f"flax params not consumed by the torch mapping: "
                         f"{leftover[:10]} (+{max(0, len(leftover) - 10)} more)")
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth/.ckpt file and convert to flax params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k: v.numpy() for k, v in state_dict.items()
                  if hasattr(v, "numpy")}
    return torch_state_dict_to_flax(state_dict)
