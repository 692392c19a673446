"""Fused cosine-similarity scan over the (flat-layout) voxel token store.

The query-side hot op (reference memory_2.py:642-663 scans HDF5 groups
in Python; here the whole store is scanned in one HBM pass): for every
cached token row, its cosine similarity to the query vector; the
per-voxel max happens on the [V, K] reshape of the result.

The store is laid out [V*K, D] precisely so this pass reads no padding
(a rank-3 [V, 10, D] array is tile-padded to [V, 16, D] on TPU: +60%
bytes).  The Pallas kernel fuses the dot products with the norm
division and empty-slot masking; block pipelining streams the token
slab through VMEM.  The jnp composition is equivalent and serves CPU,
int8 stores (the int8->bf16 convert fuses into the XLA matmul read) and
unaligned capacities.

Measured (v5e, 2.62M rows x 1024): kernel 17.3 ms, XLA 16.0 ms (int8);
19.6 vs 18.6 ms (bf16) -- both are matvec-limited (a [VK,D]x[D] product
uses one MXU column), so the scan is at its practical single-query
ceiling; larger kernel blocks don't help (and R>=4096 hits a Mosaic
reshape limit).  Batching query vectors [D,Q] would amortize the HBM
read Q-fold if a multi-query call site ever appears.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 1024          # token rows per grid program (bf16: 2 MB blocks)


def masked_norms(norms_flat, counts, K):
    """[VK] norms + [V] counts -> [VK] with -1 marking empty slots."""
    V1 = counts.shape[0]
    valid = (jnp.arange(K)[None, :] < counts[:, None]).reshape(V1 * K)
    return jnp.where(valid, jnp.maximum(norms_flat, 1e-12), -1.0)


def _sim_kernel(q_ref, feats_ref, mnorm_ref, out_ref):
    x = feats_ref[...]                            # [ROWS, D]
    q = q_ref[...].astype(jnp.float32)            # [1, D]
    dots = jnp.dot(x.astype(jnp.float32), q[0],
                   preferred_element_type=jnp.float32)
    mn = mnorm_ref[0].reshape(-1)                 # [ROWS]
    sims = jnp.where(mn > 0, dots / mn, float("-inf"))
    out_ref[0] = sims.reshape(8, _ROWS // 8)


def _row_cosines_pallas(feats, mnorm_flat, q, interpret=False):
    VK, D = feats.shape
    G = VK // _ROWS
    out = pl.pallas_call(
        _sim_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _ROWS // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, _ROWS // 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 8, _ROWS // 8), jnp.float32),
        interpret=interpret,
    )(q.astype(jnp.float32)[None], feats,
      mnorm_flat.reshape(G, 8, _ROWS // 8))
    return out.reshape(VK)


def reference_row_cosines(feats, mnorm_flat, q):
    """jnp composition of the same row-cosine pass."""
    if feats.dtype == jnp.int8:
        dots = jnp.einsum("rd,d->r", feats.astype(jnp.bfloat16),
                          q.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    else:
        dots = jnp.einsum("rd,d->r", feats, q.astype(feats.dtype),
                          preferred_element_type=jnp.float32)
    return jnp.where(mnorm_flat > 0, dots / mnorm_flat, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def max_cosine_per_voxel(feats, norms, counts, q, interpret: bool = False):
    """feats [V1*K, D], norms [V1*K] f32, counts [V1] i32, q [D] f32
    -> [V1] f32 max cosine (-inf for empty voxels)."""
    VK, D = feats.shape
    V1 = counts.shape[0]
    K = VK // V1
    mnorm = masked_norms(norms, counts, K)
    use_kernel = (VK % _ROWS == 0 and feats.dtype != jnp.int8
                  and (interpret or jax.default_backend() == "tpu"))
    if use_kernel:
        sims = _row_cosines_pallas(feats, mnorm, q, interpret=interpret)
    else:
        sims = reference_row_cosines(feats, mnorm, q)
    return jnp.max(sims.reshape(V1, K), axis=1)


def reference_max_cosine(feats, norms, counts, q):
    """Pure-jnp end-to-end (used by tests as the oracle)."""
    VK, D = feats.shape
    V1 = counts.shape[0]
    K = VK // V1
    mnorm = masked_norms(norms, counts, K)
    sims = reference_row_cosines(feats, mnorm, q)
    return jnp.max(sims.reshape(V1, K), axis=1)


def max_cosine(feats, norms, counts, q):
    """Canonical dispatch used by memory/query.py."""
    return max_cosine_per_voxel(feats, norms, counts, q)


@jax.jit
def max_cosine_per_voxel_batch(feats, norms, counts, qs):
    """Batched-query scan: qs [Q, D] -> [Q, V1] max cosines.

    The single-query scan is MATVEC-limited (one MXU column active, see
    module docstring); batching turns it into a [VK, D] x [D, Q] MATMUL
    that amortizes the store's HBM read Q-fold -- Q queries cost barely
    more than one.  Serves multi-goal retrieval (two-stage text+image
    queries, episode farming)."""
    VK, D = feats.shape
    V1 = counts.shape[0]
    K = VK // V1
    mnorm = masked_norms(norms, counts, K)
    if feats.dtype == jnp.int8:
        dots = jnp.einsum("rd,qd->qr", feats.astype(jnp.bfloat16),
                          qs.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    else:
        dots = jnp.einsum("rd,qd->qr", feats, qs.astype(feats.dtype),
                          preferred_element_type=jnp.float32)
    sims = jnp.where(mnorm[None] > 0, dots / mnorm[None], -jnp.inf)
    return jnp.max(sims.reshape(-1, V1, K), axis=2)
