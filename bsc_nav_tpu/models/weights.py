"""Checkpoint conversion: torch state dicts -> JAX param pytrees.

The reference loads all perception models as frozen torch checkpoints
(DINOv2 via torch.hub memory_2.py:43, open_clip objnav_benchmark.py:309,
YOLO-World memory_2.py:49, SD3.5 memory_2.py:542-560).  This module maps
those public checkpoint layouts onto our JAX modules.  No weights ship
with this repo; converters run when the user supplies checkpoint files
(torch is only imported lazily, host-side).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from bsc_nav_tpu.models.vit import ViTConfig


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (lazy torch import)."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def convert_dinov2(state_dict: Mapping[str, Any], cfg: ViTConfig,
                   dtype=jnp.float32) -> Dict[str, Any]:
    """facebookresearch/dinov2 state-dict layout -> vit.py params.

    Key mapping (dinov2 naming):
      patch_embed.proj.{weight [D,3,P,P], bias}
      cls_token [1,1,D], pos_embed [1,1+T,D], register_tokens [1,R,D]
      blocks.{i}.norm1.{weight,bias}
      blocks.{i}.attn.qkv.{weight [3D,D], bias}
      blocks.{i}.attn.proj.{weight,bias}
      blocks.{i}.ls1.gamma / ls2.gamma
      blocks.{i}.mlp.fc1/fc2.{weight,bias}   (mlp)
      blocks.{i}.mlp.w12/w3.{weight,bias}    (swiglu variants)
      norm.{weight,bias}
    """
    sd = {k: _t(v) for k, v in state_dict.items()}
    d = cfg.dim

    def lin(prefix):
        out = {"w": jnp.asarray(sd[prefix + ".weight"].T, dtype)}
        if prefix + ".bias" in sd:
            out["b"] = jnp.asarray(sd[prefix + ".bias"], dtype)
        return out

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"], dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    # conv kernel [D, 3, P, P] -> unfold matmul weight [(P*P*3), D] with
    # (ph, pw, c) inner ordering to match vit.patchify
    w = sd["patch_embed.proj.weight"]
    w = w.transpose(2, 3, 1, 0).reshape(-1, d)
    params: Dict[str, Any] = {
        "patch_embed": {"w": jnp.asarray(w, dtype),
                        "b": jnp.asarray(sd["patch_embed.proj.bias"], dtype)},
        "cls_token": jnp.asarray(sd["cls_token"], dtype),
        "pos_embed": jnp.asarray(sd["pos_embed"], dtype),
        "norm": ln("norm"),
        "blocks": [],
    }
    if "register_tokens" in sd and cfg.num_registers:
        params["reg_token"] = jnp.asarray(sd["register_tokens"], dtype)

    for i in range(cfg.depth):
        p = f"blocks.{i}"
        blk = {
            "ln1": ln(f"{p}.norm1"),
            "qkv": lin(f"{p}.attn.qkv"),
            "proj": lin(f"{p}.attn.proj"),
            "ln2": ln(f"{p}.norm2"),
        }
        if cfg.ffn == "swiglu":
            blk["fc1"] = lin(f"{p}.mlp.w12")
            blk["fc2"] = lin(f"{p}.mlp.w3")
        else:
            blk["fc1"] = lin(f"{p}.mlp.fc1")
            blk["fc2"] = lin(f"{p}.mlp.fc2")
        if f"{p}.ls1.gamma" in sd:
            blk["ls1"] = jnp.asarray(sd[f"{p}.ls1.gamma"], dtype)
            blk["ls2"] = jnp.asarray(sd[f"{p}.ls2.gamma"], dtype)
        params["blocks"].append(blk)
    return params


def convert_dinov2_hf(state_dict: Mapping[str, Any], cfg: ViTConfig,
                      dtype=jnp.float32) -> Dict[str, Any]:
    """HuggingFace `Dinov2WithRegistersModel` state dict -> vit.py params.

    The reference obtains DINOv2 from torch.hub (memory_2.py:43), but the
    same checkpoints ship on the Hub (facebook/dinov2-with-registers-large)
    in the transformers layout.  Differences from the hub layout handled
    here: separate q/k/v projections (fused into our [D, 3D] qkv with
    q|k|v column blocks), `layer_scale{1,2}.lambda1` names, and the
    `embeddings.*` prefix.  Parity is proven against a random-init
    transformers model in tests/test_hf_converters.py.
    """
    sd = {k: _t(v) for k, v in state_dict.items()}
    d = cfg.dim

    def lin(prefix):
        out = {"w": jnp.asarray(sd[prefix + ".weight"].T, dtype)}
        if prefix + ".bias" in sd:
            out["b"] = jnp.asarray(sd[prefix + ".bias"], dtype)
        return out

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"], dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype)}

    w = sd["embeddings.patch_embeddings.projection.weight"]
    w = w.transpose(2, 3, 1, 0).reshape(-1, d)
    params: Dict[str, Any] = {
        "patch_embed": {
            "w": jnp.asarray(w, dtype),
            "b": jnp.asarray(
                sd["embeddings.patch_embeddings.projection.bias"], dtype)},
        "cls_token": jnp.asarray(sd["embeddings.cls_token"], dtype),
        "pos_embed": jnp.asarray(sd["embeddings.position_embeddings"], dtype),
        "norm": ln("layernorm"),
        "blocks": [],
    }
    if "embeddings.register_tokens" in sd and cfg.num_registers:
        params["reg_token"] = jnp.asarray(
            sd["embeddings.register_tokens"], dtype)

    for i in range(cfg.depth):
        p = f"encoder.layer.{i}"
        qkv_w = np.concatenate(
            [sd[f"{p}.attention.attention.{n}.weight"].T
             for n in ("query", "key", "value")], axis=1)
        qkv_b = np.concatenate(
            [sd[f"{p}.attention.attention.{n}.bias"]
             for n in ("query", "key", "value")])
        blk = {
            "ln1": ln(f"{p}.norm1"),
            "qkv": {"w": jnp.asarray(qkv_w, dtype),
                    "b": jnp.asarray(qkv_b, dtype)},
            "proj": lin(f"{p}.attention.output.dense"),
            "ln2": ln(f"{p}.norm2"),
        }
        if cfg.ffn == "swiglu":
            blk["fc1"] = lin(f"{p}.mlp.weights_in")
            blk["fc2"] = lin(f"{p}.mlp.weights_out")
        else:
            blk["fc1"] = lin(f"{p}.mlp.fc1")
            blk["fc2"] = lin(f"{p}.mlp.fc2")
        if f"{p}.layer_scale1.lambda1" in sd:
            blk["ls1"] = jnp.asarray(sd[f"{p}.layer_scale1.lambda1"], dtype)
            blk["ls2"] = jnp.asarray(sd[f"{p}.layer_scale2.lambda1"], dtype)
        params["blocks"].append(blk)
    return params


def load_dinov2_npz(path: str, cfg: ViTConfig, dtype=jnp.float32):
    """Load a converted .npz produced by save_params_npz."""
    z = np.load(path)
    return unflatten_params({k: jnp.asarray(v, dtype) for k, v in z.items()})


def flatten_params(params: Dict[str, Any], prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten_params(v, f"{prefix}{k}."))
    elif isinstance(params, list):
        for i, v in enumerate(params):
            out.update(flatten_params(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(params)
    return out


def unflatten_params(flat: Mapping[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree)


def save_params_npz(params: Dict[str, Any], path: str) -> None:
    np.savez_compressed(path, **flatten_params(params))
