"""Cache consolidation: the "forgetting" strategy as a vectorized pass.

Counterpart of the reference's forgetting_strategy (reference
memory_2.py:386-446): within each voxel's token cache, tokens whose
pairwise cosine similarity exceeds `boring_threshold` are grouped by
union-find and replaced with their group means (features AND distances),
compacting the cache.  The reference runs it per updated voxel inside
the HDF5 flush; here it is ONE vmapped program over every voxel
(union-find becomes K rounds of min-label propagation over the K x K
adjacency -- K = cache_size = 10, so the fixpoint is reached within K
iterations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bsc_nav_tpu.memory.store import VoxelStoreState


def _consolidate_one(feats, norms, dists, count, K, threshold,
                     scales=None):
    """One voxel: [K, D], [K], [K], scalar -> compacted cache.

    scales [K] (int8 stores): the cosine grouping runs on the raw codes
    (per-token scales cancel), but the group MEAN must be computed on
    dequantized features and re-quantized with a fresh per-token scale
    -- averaging codes across different scales would corrupt them."""
    kmask = jnp.arange(K) < count
    f32 = feats.astype(jnp.float32)
    sims = jnp.einsum("kd,ld->kl", f32, f32,
                      preferred_element_type=jnp.float32)
    denom = jnp.maximum(norms[:, None] * norms[None, :], 1e-12)
    sims = sims / denom
    adj = (sims > threshold) & kmask[:, None] & kmask[None, :]
    adj = adj | jnp.eye(K, dtype=bool)

    # min-label propagation: labels converge to the component minimum
    labels0 = jnp.arange(K, dtype=jnp.int32)

    def prop(_, labels):
        # label <- min over neighbors' labels
        neigh = jnp.where(adj, labels[None, :], K)
        return jnp.minimum(labels, jnp.min(neigh, axis=1))

    labels = jax.lax.fori_loop(0, K, prop, labels0)
    labels = jnp.where(kmask, labels, K)

    fdeq = f32 if scales is None else f32 * scales[:, None]

    # group means via segment ops over the K labels
    one_hot = (labels[:, None] == jnp.arange(K)[None, :]) & kmask[:, None]
    gcount = jnp.sum(one_hot, axis=0).astype(jnp.float32)       # [K]
    gsum = jnp.einsum("kg,kd->gd", one_hot.astype(jnp.float32), fdeq,
                      preferred_element_type=jnp.float32)
    gdist = jnp.einsum("kg,k->g", one_hot.astype(jnp.float32),
                       dists.astype(jnp.float32))
    live = gcount > 0
    gmean = gsum / jnp.maximum(gcount, 1.0)[:, None]
    gmean_dist = gdist / jnp.maximum(gcount, 1.0)

    if scales is not None:
        absmax = jnp.maximum(jnp.max(jnp.abs(gmean), axis=-1), 1e-12)
        gscale = absmax / 127.0
        gmean = jnp.clip(jnp.round(gmean / gscale[:, None]), -127, 127)

    # compact live groups to the front (stable)
    rank = jnp.cumsum(live.astype(jnp.int32)) - 1
    dest = jnp.where(live, rank, K)
    out_f = jnp.zeros((K, f32.shape[1]), jnp.float32
                      ).at[dest].set(gmean, mode="drop")
    out_d = jnp.zeros_like(gmean_dist).at[dest].set(gmean_dist, mode="drop")
    new_count = jnp.sum(live.astype(jnp.int32))
    out_n = jnp.linalg.norm(out_f, axis=-1)
    out_s = None
    if scales is not None:
        out_s = jnp.full((K,), 1.0, jnp.float32
                         ).at[dest].set(gscale, mode="drop")
    return (out_f.astype(feats.dtype), out_n, out_d,
            jnp.minimum(new_count, count), out_s)


@functools.partial(jax.jit, static_argnames=("threshold",))
def forgetting_pass(state: VoxelStoreState,
                    threshold: float = 0.95) -> VoxelStoreState:
    """Merge near-duplicate cached tokens in every voxel.  int8 stores
    consolidate on dequantized features and refresh feat_scale."""
    V1 = state.feat_count.shape[0]
    K = state.feats.shape[0] // V1
    D = state.feats.shape[1]
    is_int8 = state.feats.dtype == jnp.int8 \
        and state.feat_scale.shape[0] > 1
    if is_int8:
        f, n, d, c, s = jax.vmap(
            lambda fe, no, di, co, sc: _consolidate_one(
                fe, no, di, co, K, threshold, scales=sc)
        )(state.feats.reshape(V1, K, D), state.feat_norm.reshape(V1, K),
          state.feat_dist.reshape(V1, K), state.feat_count,
          state.feat_scale.reshape(V1, K))
        return state.replace(feats=f.reshape(V1 * K, D),
                             feat_norm=n.reshape(V1 * K),
                             feat_dist=d.reshape(V1 * K), feat_count=c,
                             feat_scale=s.reshape(V1 * K))
    f, n, d, c, _ = jax.vmap(
        lambda fe, no, di, co: _consolidate_one(fe, no, di, co, K, threshold)
    )(state.feats.reshape(V1, K, D), state.feat_norm.reshape(V1, K),
      state.feat_dist.reshape(V1, K), state.feat_count)
    return state.replace(feats=f.reshape(V1 * K, D),
                         feat_norm=n.reshape(V1 * K),
                         feat_dist=d.reshape(V1 * K), feat_count=c)
