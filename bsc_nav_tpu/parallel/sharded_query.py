"""Distributed query over a capacity-sharded token store.

The token store is this framework's "long context" (SURVEY §2.4): up to
millions of 1024-d tokens.  For stores sharded over the `mp` mesh axis
(parallel/mesh.py `store_sharding`), the query is expressed with
shard_map so the communication is explicit and minimal:

  per shard:   cosine similarity over the LOCAL [V/mp, K, D] slab,
               per-voxel max, LOCAL top-k          (no communication)
  collective:  all_gather of k*mp (score, slot) candidates over ICI
  per shard:   merge-sort the candidates -> global top-k (replicated)

This moves k*mp scalars over the interconnect instead of the V-sized
score vector GSPMD would otherwise gather.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from bsc_nav_tpu.memory.store import VoxelStoreState


def make_sharded_localize(mesh: Mesh, top_k: int = 100):
    """Build a jitted sharded localize: (feats, feat_norm, feat_count,
    slot_pos, num_voxels, query) -> (positions, scores).

    The four store arrays must be sharded over ('mp',) on the capacity
    axis (or replicated; shard_map requires the shapes to divide)."""

    mp = mesh.shape["mp"]

    def _local(feats, norm, count, pos, num_voxels, query):
        # shapes here are the PER-SHARD slabs (flat [Vl*K, D] tokens)
        Vl = count.shape[0]
        K = feats.shape[0] // Vl
        shard = jax.lax.axis_index("mp")
        base = shard * Vl                          # global slot offset

        qn = query.astype(jnp.float32)
        qn = qn / jnp.maximum(jnp.linalg.norm(qn), 1e-12)
        if feats.dtype == jnp.int8:
            # int8 cast of a unit-norm query would truncate every
            # component in (-1, 1) to 0; upcast the store instead
            # (mirrors ops/similarity.reference_row_cosines -- the
            # int8->bf16 convert fuses into the matmul read)
            dots = jnp.einsum("rd,d->r", feats.astype(jnp.bfloat16),
                              qn.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        else:
            dots = jnp.einsum("rd,d->r", feats, qn.astype(feats.dtype),
                              preferred_element_type=jnp.float32)
        sims = (dots / jnp.maximum(norm, 1e-12)).reshape(Vl, K)
        kmask = jnp.arange(K)[None, :] < count[:, None]
        per_voxel = jnp.max(jnp.where(kmask, sims, -jnp.inf), axis=1)

        occupied = (base + jnp.arange(Vl)) < num_voxels
        per_voxel = jnp.where(occupied, per_voxel, -jnp.inf)

        k_local = min(top_k, Vl)
        loc_scores, loc_idx = jax.lax.top_k(per_voxel, k_local)
        loc_pos = pos[loc_idx]

        # gather k*mp candidates from every shard (tiny transfer)
        all_scores = jax.lax.all_gather(loc_scores, "mp").reshape(-1)
        all_pos = jax.lax.all_gather(loc_pos, "mp").reshape(-1, 3)
        g_scores, g_idx = jax.lax.top_k(all_scores, top_k)
        return all_pos[g_idx], g_scores

    fn = shard_map(
        _local, mesh=mesh,
        in_specs=(P("mp"), P("mp"), P("mp"), P("mp"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


_BUILT_CACHE: dict = {}


def sharded_localize(state: VoxelStoreState, query: jnp.ndarray,
                     mesh: Mesh, top_k: int = 100
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper over make_sharded_localize.  The built
    shard_map+jit is cached per (mesh, top_k): rebuilding per call would
    retrace (and recompile, minutes through the tunnel) on EVERY query."""
    key = (mesh, top_k)
    fn = _BUILT_CACHE.get(key)
    if fn is None:
        fn = _BUILT_CACHE[key] = make_sharded_localize(mesh, top_k)
    return fn(state.feats, state.feat_norm, state.feat_count,
              state.slot_pos, state.num_voxels, query)
