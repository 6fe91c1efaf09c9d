"""Convert a reference (torch) Str2Str checkpoint into flax params.

The reference publishes `pretrain.pth` — a raw ``{'state_dict': ...}`` with
``net.``-prefixed torch parameter names (reference checkpoint_utils.py:3-27).
This module maps that naming/layout onto the ScoreNetwork param pytree:

  torch ``Linear.weight`` is (out, in)  ->  flax ``kernel`` is (in, out): transpose
  torch ``LayerNorm.weight/bias``       ->  flax ``scale``/``bias``
  torch ``nn.TransformerEncoderLayer.self_attn.in_proj_weight`` (packed QKV)
                                        ->  ``self_attn/in_proj/kernel`` (transposed;
                                            our attention splits columns q,k,v in
                                            the same order)

Works on numpy arrays; torch is only needed to deserialize ``.pth`` files.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _set(tree: dict, path: tuple, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_state_dict_to_flax(state_dict: Dict[str, np.ndarray]) -> dict:
    """Map torch parameter names to the ScoreNetwork flax param tree.

    Accepts names with or without the leading ``net.`` prefix.
    Returns {'params': ...} ready for `ScoreNetwork.apply`.
    """
    params: dict = {}
    unused = []

    def put(path, arr, transpose=False):
        arr = np.asarray(arr)
        _set(params, path, arr.T if transpose else arr)

    for name, tensor in state_dict.items():
        name = re.sub(r"^net\.", "", name)
        name = re.sub(r"^_orig_mod\.", "", name)  # torch.compile artifacts
        arr = np.asarray(tensor, dtype=np.float32)
        parts = name.split(".")

        # ---- embedder ----------------------------------------------------
        m = re.match(r"embedder\.(node|edge)_embed\.(\d+)\.(weight|bias)$", name)
        if m:
            which, idx, kind = m.group(1), int(m.group(2)), m.group(3)
            base = ("embedder", f"{which}_embed")
            if idx == 0 and which == "edge":
                # Decomposed first layer: flat kernel/bias params.
                if kind == "weight":
                    put(base + ("linear_0_kernel",), arr, transpose=True)
                else:
                    put(base + ("linear_0_bias",), arr)
            elif idx in (0, 2, 4):  # Linear layers of the Sequential
                leaf = "kernel" if kind == "weight" else "bias"
                put(base + (f"linear_{idx // 2}", leaf), arr, transpose=kind == "weight")
            else:  # index 5: LayerNorm
                leaf = "scale" if kind == "weight" else "bias"
                put(base + ("norm", leaf), arr)
            continue

        # ---- trunk modules -------------------------------------------------
        m = re.match(r"translator\.trunk\.([\w]+?)\.(.*)$", name)
        if m:
            module, rest = m.group(1), m.group(2)
            base = ("translator", module)

            # IPA blocks
            if module.startswith("ipa_ln_"):
                leaf = "scale" if rest == "weight" else "bias"
                put(base + (leaf,), arr)
                continue
            if module.startswith("ipa_"):
                if rest == "head_weights":
                    put(base + ("head_weights",), arr)
                else:
                    sub, kind = rest.rsplit(".", 1)
                    leaf = "kernel" if kind == "weight" else "bias"
                    put(base + (sub, leaf), arr, transpose=kind == "weight")
                continue

            if module.startswith("skip_embed_") or module.startswith("linear_"):
                leaf = "kernel" if rest == "weight" else "bias"
                put(base + (leaf,), arr, transpose=rest == "weight")
                continue

            if module.startswith("transformer_"):
                # rest like: layers.0.self_attn.in_proj_weight
                tm = re.match(r"layers\.(\d+)\.(.*)$", rest)
                li, sub = int(tm.group(1)), tm.group(2)
                lbase = base + (f"layers_{li}",)
                if sub == "self_attn.in_proj_weight":
                    put(lbase + ("self_attn", "in_proj", "kernel"), arr, transpose=True)
                elif sub == "self_attn.in_proj_bias":
                    put(lbase + ("self_attn", "in_proj", "bias"), arr)
                elif sub == "self_attn.out_proj.weight":
                    put(lbase + ("self_attn", "out_proj", "kernel"), arr, transpose=True)
                elif sub == "self_attn.out_proj.bias":
                    put(lbase + ("self_attn", "out_proj", "bias"), arr)
                elif sub in ("linear1.weight", "linear2.weight"):
                    put(lbase + (sub.split(".")[0], "kernel"), arr, transpose=True)
                elif sub in ("linear1.bias", "linear2.bias"):
                    put(lbase + (sub.split(".")[0], "bias"), arr)
                elif sub in ("norm1.weight", "norm2.weight"):
                    put(lbase + (sub.split(".")[0], "scale"), arr)
                elif sub in ("norm1.bias", "norm2.bias"):
                    put(lbase + (sub.split(".")[0], "bias"), arr)
                else:
                    unused.append(name)
                continue

            if module.startswith("node_transition_"):
                sub, kind = rest.rsplit(".", 1)
                if sub == "ln":
                    leaf = "scale" if kind == "weight" else "bias"
                    put(base + ("ln", leaf), arr)
                else:
                    leaf = "kernel" if kind == "weight" else "bias"
                    put(base + (sub, leaf), arr, transpose=kind == "weight")
                continue

            if module.startswith("bb_update_"):
                # rest: linear.weight / linear.bias
                kind = rest.split(".")[-1]
                leaf = "kernel" if kind == "weight" else "bias"
                put(base + ("linear", leaf), arr, transpose=kind == "weight")
                continue

            if module.startswith("edge_transition_"):
                # Our EdgeTransition decomposes the concat matmuls but keeps
                # the same kernel shapes as flat (in, out) parameters.
                em = re.match(r"initial_embed\.(weight|bias)$", rest)
                if em:
                    leaf = "kernel" if em.group(1) == "weight" else "bias"
                    put(base + ("initial_embed", leaf), arr,
                        transpose=em.group(1) == "weight")
                    continue
                em = re.match(r"final_layer\.(weight|bias)$", rest)
                if em:
                    if em.group(1) == "weight":
                        put(base + ("final_kernel",), arr, transpose=True)
                    else:
                        put(base + ("final_bias",), arr)
                    continue
                em = re.match(r"trunk\.(\d+)\.(weight|bias)$", rest)
                if em:  # Sequential [Linear, ReLU, Linear, ReLU] -> 0, 2
                    i = int(em.group(1)) // 2
                    if em.group(2) == "weight":
                        put(base + (f"trunk_{i}_kernel",), arr, transpose=True)
                    else:
                        put(base + (f"trunk_{i}_bias",), arr)
                    continue
                em = re.match(r"layer_norm\.(weight|bias)$", rest)
                if em:
                    leaf = "scale" if em.group(1) == "weight" else "bias"
                    put(base + ("layer_norm", leaf), arr)
                    continue
                unused.append(name)
                continue

            unused.append(name)
            continue

        # ---- torsion head -----------------------------------------------------
        m = re.match(r"translator\.torsion_pred\.(linear_\w+)\.(weight|bias)$", name)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            put(("translator", "torsion_pred", m.group(1), leaf), arr,
                transpose=m.group(2) == "weight")
            continue

        unused.append(name)

    if unused:
        raise ValueError(f"unmapped torch parameters: {unused[:10]}"
                         f" (+{max(0, len(unused) - 10)} more)")
    return {"params": params}


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth/.ckpt file and convert to flax params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    state_dict = {k: v.numpy() for k, v in state_dict.items()
                  if hasattr(v, "numpy")}
    return torch_state_dict_to_flax(state_dict)
