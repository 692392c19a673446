"""Device mesh construction and sharding rules.

The reference is strictly single-GPU (SURVEY §2.4); scale-out here is a
first-class design: a 2D ("dp", "mp") mesh where

  dp  shards frames/episodes (memory build is embarrassingly parallel
      over frames once decoupled from sim stepping),
  mp  shards (a) large encoder matmuls tensor-parallel over ICI and
      (b) the voxel token store's capacity axis for query similarity.

Sharding is expressed with GSPMD annotations (NamedSharding +
with_sharding_constraint) so XLA inserts the ICI collectives; no
hand-written NCCL-style communication (per the TPU-first design rules).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, mp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * mp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(dp, mp)
    return Mesh(dev, axis_names=("dp", "mp"))


def vit_param_spec(path_leaf: str) -> P:
    """Tensor-parallel partitioning for ViT params over the mp axis.

    Megatron-style: qkv / fc1 column-parallel (output dim sharded),
    attn-proj / fc2 row-parallel (input dim sharded); XLA inserts the
    reduce for the row-parallel matmuls.
    """
    name = path_leaf
    if name.endswith("qkv.w") or name.endswith("fc1.w"):
        return P(None, "mp")
    if name.endswith("qkv.b") or name.endswith("fc1.b"):
        return P("mp")
    if name.endswith("proj.w") or name.endswith("fc2.w"):
        return P("mp", None)
    return P()


def shard_vit_params(params, mesh: Mesh, tp_qkv_layout: bool = False):
    """Place ViT params on the mesh with TP sharding over mp.

    tp_qkv_layout: permute the fused qkv projection's output columns
    into the head-blocked layout (ops/flash_attention.qkv_tp_permutation)
    so each mp shard's chunk is [q_heads_s | k_heads_s | v_heads_s] and
    attention can run per-shard with zero collectives
    (flash_attention.attention_from_qkv_tp).  The model forward must
    then be called with `tp_mesh=mesh`."""
    from bsc_nav_tpu.ops.flash_attention import qkv_tp_permutation

    mp = mesh.shape["mp"]
    perm = qkv_tp_permutation(
        params["blocks"][0]["qkv"]["w"].shape[0], mp
    ) if tp_qkv_layout and mp > 1 else None

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def path_str(path):
        return ".".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

    out = []
    for path, leaf in flat:
        name = path_str(path)
        spec = vit_param_spec(name)
        if perm is not None and (name.endswith("qkv.w")
                                 or name.endswith("qkv.b")):
            leaf = leaf[..., perm]
        # only shard dims that divide evenly; fall back to replication
        ok = all(
            s is None or leaf.shape[i] % mesh.shape[s] == 0
            for i, s in enumerate(spec + (None,) * (leaf.ndim - len(spec)))
        ) and len(spec) <= leaf.ndim
        sharding = NamedSharding(mesh, spec if ok else P())
        out.append(jax.device_put(leaf, sharding))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_mmdit_params(params, mesh: Mesh):
    """Tensor-parallel placement of MMDiT params over the mp axis.

    Same Megatron pattern as shard_vit_params, per stream: qkv
    column-parallel with the head-blocked permutation (the per-shard
    chunk is [q_heads_s | k_heads_s | v_heads_s] so
    flash_attention.joint_qkv_attention_tp runs the fused kernel on
    local heads with zero collectives), attn-proj / fc2 row-parallel,
    fc1 column-parallel.  adaLN modulation, qk-norm gammas, embeds, and
    the final head stay replicated (they act on replicated activations
    around the full-width LayerNorms).  Call mmdit.forward with
    `tp_mesh=mesh` afterwards."""
    from bsc_nav_tpu.ops.flash_attention import qkv_tp_permutation

    mp = mesh.shape["mp"]
    if mp > 1:
        dim = params["blocks"][0]["x"]["qkv"]["w"].shape[0]
        heads_hint = params["blocks"][0]["x"].get("q_norm")
        if heads_hint is not None:
            heads = dim // heads_hint.shape[0]
            assert heads % mp == 0, (
                f"MMDiT TP needs heads % mp == 0 (heads={heads}, "
                f"mp={mp}) -- the head-blocked qkv shards would split "
                f"heads across chips")
        perm = qkv_tp_permutation(dim, mp)
    else:
        perm = None

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def path_str(path):
        return ".".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

    out = []
    for path, leaf in flat:
        name = path_str(path)
        if ".x." in name or ".ctx." in name:
            spec = vit_param_spec(name)
            # modulation + qk-norm act on replicated activations
            if name.endswith("mod.w") or name.endswith("mod.b") \
                    or "q_norm" in name or "k_norm" in name:
                spec = P()
        else:
            spec = P()
        if perm is not None and (name.endswith("qkv.w")
                                 or name.endswith("qkv.b")):
            leaf = leaf[..., perm]
        ok = all(
            s is None or leaf.shape[i] % mesh.shape[s] == 0
            for i, s in enumerate(spec + (None,) * (leaf.ndim - len(spec)))
        ) and len(spec) <= leaf.ndim
        sharding = NamedSharding(mesh, spec if ok else P())
        out.append(jax.device_put(leaf, sharding))
    return jax.tree_util.tree_unflatten(treedef, out)


def store_sharding(mesh: Mesh) -> Dict[str, P]:
    """Voxel store sharding: the big token arrays shard over mp on the
    capacity axis (the 'long context' axis of this framework, SURVEY
    §2.4); index maps stay replicated (they are written by data-dependent
    scatter)."""
    return {
        "feats": P("mp"),
        "feat_norm": P("mp"),
        "feat_dist": P("mp"),
        "feat_scale": P("mp"),
        "feat_sum": P("mp"),
        "feat_obs": P("mp"),
        "feat_count": P("mp"),
        "rgb_sum": P("mp"),
        "weight": P("mp"),
        "slot_pos": P("mp"),
        "slot_map": P(),
        "num_voxels": P(),
        "dropped_voxels": P(),
        "cv_map": P(),
        "max_height": P(),
        "inv_init_base_tf": P(),
        "initialized": P(),
    }


def shard_store(state, mesh: Mesh):
    """Place a VoxelStoreState on the mesh.  Arrays whose capacity axis
    does not divide mp evenly are replicated."""
    specs = store_sharding(mesh)

    def place(name, leaf):
        spec = specs[name]
        if spec and leaf.shape[0] % mesh.shape["mp"] != 0:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return state.replace(**{
        name: place(name, getattr(state, name)) for name in specs
    })


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """Frame batches shard over dp on the leading axis."""
    return NamedSharding(mesh, P("dp"))
