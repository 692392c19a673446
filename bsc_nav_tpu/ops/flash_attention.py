"""Pallas TPU flash attention (forward, inference).

Serves every encoder in the framework (DINOv2-style ViT patch encoder,
CLIP towers, and the SD3.5-class MMDiT joint attention whose sequences
reach 4k+ tokens -- the reference leans on CUDA flash_attn 2.7.4,
requirements.txt; here the kernel is a blockwise online-softmax Pallas
program per SURVEY §2.4).

Layout: q, k, v are [B, H, S, Dh].  The kernel runs on a (B*H, S/bq)
grid; each program streams K/V in bk-sized blocks from VMEM with an
online softmax accumulator in f32 scratch.  Supports an optional causal
mask (CLIP text tower).

Falls back to a pure-jnp implementation off-TPU (CPU tests) and for
shapes the kernel doesn't support.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def reference_attention(q, k, v, causal: bool = False, scale=None):
    """Pure-jnp attention oracle, f32 accumulation. [B, H, S, Dh]."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        s_q, s_k = logits.shape[-2:]
        mask = jnp.tril(jnp.ones((s_q, s_k), bool), k=s_k - s_q)
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, bk: int, s_k: int, kv_len: int, scale: float,
                  causal: bool, bq: int):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale            # [bq, d]

    m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    n_kb = s_k // bk

    def body(kb, _):
        k_blk = k_ref[0, pl.ds(kb * bk, bk), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * bk, bk), :].astype(jnp.float32)
        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)

        k_pos = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        logits = jnp.where(k_pos < kv_len, logits, _NEG_INF)
        if causal:
            q_pos = qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0)
            logits = jnp.where(q_pos >= k_pos, logits, _NEG_INF)

        m_prev = m_scr[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1))
        p = jnp.exp(logits - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=1)
        acc_scr[:] = acc_scr[:] * alpha[:, None] + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32)
        m_scr[:, 0] = m_new
        return 0

    jax.lax.fori_loop(0, n_kb, body, 0)
    o_ref[0] = (acc_scr[:] / l_scr[:, 0][:, None]).astype(o_ref.dtype)


def _pad_to(x, mult, axis, value=0.0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def flash_attention(q, k, v, causal: bool = False, interpret: bool = False):
    """Blockwise attention.  q, k, v: [B, H, S, Dh] (S_q may differ from
    S_k only when not causal)."""
    B, H, Sq, Dh = q.shape
    Sk = k.shape[2]
    if causal:
        # kernels mask with q_pos >= k_pos (no Sk-Sq offset); the oracle
        # applies tril(k=Sk-Sq) — only identical for square attention
        assert Sq == Sk, f"causal requires Sq == Sk, got {Sq} != {Sk}"
    scale = 1.0 / math.sqrt(Dh)

    bq = min(128, max(8, 1 << (Sq - 1).bit_length()))
    bk = min(128, max(8, 1 << (Sk - 1).bit_length()))

    # zero-pad Q/K/V to block multiples; padded KEY positions are masked
    # to -inf inside the kernel via kv_len, padded QUERY rows are sliced
    # off after the call.
    qp = _pad_to(q.reshape(B * H, Sq, Dh), bq, axis=1)
    kp = _pad_to(k.reshape(B * H, Sk, Dh), bk, axis=1)
    vp = _pad_to(v.reshape(B * H, Sk, Dh), bk, axis=1)
    Sq_p, Sk_p = qp.shape[1], kp.shape[1]

    grid = (B * H, Sq_p // bq)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, bk=bk, s_k=Sk_p, kv_len=Sk, scale=scale,
            causal=causal, bq=bq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Sk_p, Dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Sk_p, Dh), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, Dh), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq_p, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, Dh), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :Sq].reshape(B, H, Sq, Dh)


# Dispatch thresholds (measured on v5e, ViT-L/CLIP-H/MMDiT shapes):
#   - short sequences (encoders, S <= ~640): the one-shot VMEM kernel
#     below avoids the [B,H,S,S] logits/probs HBM round trip and beats
#     XLA by ~20% inside the real encoder stack;
#   - mid sequences (MMDiT joint attention, ~1k-4k): the q-tiled
#     `mid_attention` kernel (KV resident in VMEM, reused across q
#     steps) wins isolated (x8 stacks at S=1101 b6h24: mid bq256
#     14.9 ms vs XLA 18.3 ms) and ties XLA inside the full MMDiT
#     forward (145.5 vs ~142 ms/b6) -- kept for the isolated win and
#     the headroom at larger S.  The blockwise flash kernel loses BIG
#     here (52 ms: a grid of tiny [bq,64]x[64,bk] programs runs
#     sequentially on the one TensorCore);
#   - only when the [B,H,S,S] f32 logits would blow HBM/VMEM does
#     blockwise flash win: S=8192 b1h24 (6.4 GB): flash 366 ms vs XLA
#     1362 ms (spilling).  Dispatch on logits bytes, not S.
_SHORT_MAX_KV = 640
_MID_MAX_KV = 4096            # VMEM: kv f32 2x1 MB + [256, S] logits
_FLASH_MIN_LOGITS_BYTES = 4e9


def attention(q, k, v, causal: bool = False):
    """Backend/shape-dispatched attention."""
    if causal and q.shape[2] != k.shape[2]:
        raise ValueError(
            f"causal attention requires Sq == Sk (kernel masks have no "
            f"length offset); got Sq={q.shape[2]} Sk={k.shape[2]}")
    if jax.default_backend() == "tpu":
        B, H, Sq, _ = q.shape
        Sk = k.shape[2]
        if Sk <= _SHORT_MAX_KV:
            return short_attention(q, k, v, causal=causal)
        if not causal and Sk <= _MID_MAX_KV:
            return mid_attention(q, k, v)
        if B * H * Sq * Sk * 4 > _FLASH_MIN_LOGITS_BYTES:
            return flash_attention(q, k, v, causal=causal)
    return reference_attention(q, k, v, causal=causal)


# ---------------------------------------------------------------------------
# mid-sequence kernel: K/V stay resident in VMEM (their BlockSpec index
# is constant in the q-step axis, so Mosaic loads them once per (b, h));
# only q is tiled.  One-shot softmax per q tile -- no online-softmax
# state, no [B,H,S,S] HBM materialization.
# ---------------------------------------------------------------------------

def _mid_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale          # [bq, d]
    k = k_ref[0].astype(jnp.float32)                  # [Sk_p, d]
    v = v_ref[0].astype(jnp.float32)
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(k_pos < kv_len, logits, _NEG_INF)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = (out / jnp.sum(p, axis=1, keepdims=True)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "interpret"))
def mid_attention(q, k, v, bq: int = 256, interpret: bool = False):
    """Non-causal attention for 640 < S <= ~4096 (see dispatch notes)."""
    B, H, Sq, Dh = q.shape
    Sk = k.shape[2]
    scale = 1.0 / math.sqrt(Dh)
    Sq_p = ((Sq + bq - 1) // bq) * bq
    Sk_p = ((Sk + 127) // 128) * 128
    qp = jnp.pad(q.reshape(B * H, Sq, Dh), ((0, 0), (0, Sq_p - Sq),
                                            (0, 0)))
    kp = jnp.pad(k.reshape(B * H, Sk, Dh), ((0, 0), (0, Sk_p - Sk),
                                            (0, 0)))
    vp = jnp.pad(v.reshape(B * H, Sk, Dh), ((0, 0), (0, Sk_p - Sk),
                                            (0, 0)))
    out = pl.pallas_call(
        functools.partial(_mid_kernel, kv_len=Sk, scale=scale),
        grid=(B * H, Sq_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, Dh), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk_p, Dh), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk_p, Dh), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, Dh), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq_p, Dh), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :Sq].reshape(B, H, Sq, Dh)


def use_fused_qkv_attention(seq_len: int, heads: int, head_dim: int,
                            causal: bool = False) -> bool:
    """True when `attention_from_qkv` should take the fused-QKV kernel:
    TPU, non-causal, sequence fits VMEM, and head pairs fill a 128-lane
    block exactly (head_dim 64, even head count)."""
    return (jax.default_backend() == "tpu" and not causal
            and seq_len <= _SHORT_MAX_KV
            and head_dim == 64 and heads % 2 == 0)


def attention_from_qkv(qkv, heads: int, causal: bool = False):
    """Attention straight from the fused qkv projection [B, S, 3*D] ->
    [B, S, D].  Dispatches to the transpose-free Pallas kernel when
    `use_fused_qkv_attention` allows, else falls back to the standard
    split/transpose path through `attention`."""
    B, S, threeD = qkv.shape
    D = threeD // 3
    hd = D // heads
    if use_fused_qkv_attention(S, heads, hd, causal):
        # 4 heads per grid step when they divide (256-lane blocks):
        # measured 39.4 vs 41.0 ms on the full ViT-L b32 stack
        hp = 4 if heads % 4 == 0 else 2
        return short_attention_qkv(qkv, heads=heads, heads_per_block=hp)
    q, k, v = (qkv.reshape(B, S, 3, heads, hd)[:, :, i].transpose(0, 2, 1, 3)
               for i in range(3))
    att = attention(q, k, v, causal=causal)
    return att.transpose(0, 2, 1, 3).reshape(B, S, D)


# ---------------------------------------------------------------------------
# tensor-parallel attention over a device mesh
#
# Under Megatron-style TP the fused qkv projection is column-parallel:
# each mp shard holds 3*D/mp output columns.  The standard [q | k | v]
# column layout is NOT head-aligned per shard (shard 0 of mp=2 would get
# all of q plus half of k), so a GSPMD pallas_call forces an all-gather
# of the whole [B, S, 3D] activation.  Fix: permute the qkv WEIGHT
# columns into a head-blocked layout where shard s's contiguous chunk is
# [q_heads_s | k_heads_s | v_heads_s]; attention is then embarrassingly
# head-parallel and runs per-shard under shard_map with zero collectives
# (the row-parallel proj that follows does the psum, inserted by GSPMD).
# ---------------------------------------------------------------------------

def qkv_tp_permutation(dim: int, mp: int) -> "np.ndarray":
    """Column permutation [3*dim] turning the fused [q | k | v] qkv
    projection layout into the per-shard head-blocked layout
    [q_0 k_0 v_0 | q_1 k_1 v_1 | ...] (chunk s = shard s's columns).
    Apply to the qkv weight's output axis (and bias) BEFORE sharding it
    P(None, 'mp'); heads stay in original global order downstream."""
    import numpy as np
    assert dim % mp == 0
    blk = dim // mp
    perm = []
    for s in range(mp):
        for g in range(3):                     # q, k, v column groups
            start = g * dim + s * blk
            perm.extend(range(start, start + blk))
    return np.asarray(perm, dtype=np.int64)


def attention_from_qkv_tp(qkv, heads: int, mesh, axis: str = "mp",
                          causal: bool = False):
    """Tensor-parallel `attention_from_qkv`: qkv [B, S, 3*D] sharded on
    the last axis over `axis` in head-blocked layout (qkv_tp_permutation).
    Each shard runs the standard dispatch (fused Pallas kernel on TPU,
    fallback elsewhere) on its local heads; output [B, S, D] is sharded
    on the last axis in global head order.  No collectives inside."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape[axis]
    assert heads % mp == 0, (heads, mp)
    # respect data parallelism on the batch axis if the mesh carries it
    # (replicate batches that don't divide dp, e.g. small query batches)
    batch_axis = ("dp" if "dp" in mesh.axis_names
                  and qkv.shape[0] % mesh.shape["dp"] == 0 else None)

    def _local(a):
        return attention_from_qkv(a, heads=heads // mp, causal=causal)

    # check_vma=False: pallas_call inside shard_map can't express vma
    fn = shard_map(_local, mesh=mesh,
                   in_specs=P(batch_axis, None, axis),
                   out_specs=P(batch_axis, None, axis),
                   check_vma=False)
    return fn(qkv)


# ---------------------------------------------------------------------------
# short-sequence kernel: the whole sequence fits VMEM, so attention runs
# in ONE shot per (batch, head) -- no online-softmax blocking and, unlike
# the XLA path, no [B, H, S, S] logits/probs round trip through HBM
# (at ViT-L encoder shapes that traffic is ~280 MB per layer).
# ---------------------------------------------------------------------------

def _short_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int,
                  scale: float, causal: bool):
    q = q_ref[0].astype(jnp.float32) * scale            # [S, d]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s_pad = q.shape[0]
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(k_pos < kv_len, logits, _NEG_INF)
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
        logits = jnp.where(q_pos >= k_pos, logits, _NEG_INF)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    out = out / jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def short_attention(q, k, v, causal: bool = False,
                    interpret: bool = False):
    """One-shot attention for sequences that fit VMEM (S <= ~640)."""
    B, H, Sq, Dh = q.shape
    Sk = k.shape[2]
    if causal:
        assert Sq == Sk, f"causal requires Sq == Sk, got {Sq} != {Sk}"
    scale = 1.0 / math.sqrt(Dh)
    Sq_p = ((Sq + 7) // 8) * 8
    Sk_p = ((Sk + 7) // 8) * 8

    qp = _pad_to(q.reshape(B * H, Sq, Dh), 8, axis=1)
    kp = _pad_to(k.reshape(B * H, Sk, Dh), 8, axis=1)
    vp = _pad_to(v.reshape(B * H, Sk, Dh), 8, axis=1)

    out = pl.pallas_call(
        functools.partial(_short_kernel, kv_len=Sk, scale=scale,
                          causal=causal),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Sq_p, Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk_p, Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sk_p, Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Sq_p, Dh), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq_p, Dh), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :Sq].reshape(B, H, Sq, Dh)


# ---------------------------------------------------------------------------
# fused-QKV attention: reads head column-blocks STRAIGHT from the fused
# qkv projection output [B, S, 3*D] and writes [B, S, D] -- no
# [B, S, 3, h, hd] reshape, no head transposes, no separate q/k/v
# buffers.  At ViT-L b32 the transposes alone move ~2.4 GB/24 layers.
# Two heads per grid step so VMEM blocks stay 128 lanes wide.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("heads", "heads_per_block",
                                              "interpret"))
def short_attention_qkv(qkv, heads: int, heads_per_block: int = 2,
                        interpret: bool = False):
    """qkv: [B, S, 3*D] fused projection output (q | k | v column groups,
    each D wide, heads laid out contiguously inside each group).
    Returns attention output [B, S, D].  S must fit VMEM (<= ~640).

    heads_per_block: heads processed per grid step; block width is
    heads_per_block*hd lanes (2 -> 128-lane blocks at hd=64; larger
    values trade grid steps for VMEM residency)."""
    B, S, threeD = qkv.shape
    D = threeD // 3
    hd = D // heads
    hp = heads_per_block
    assert heads % hp == 0 and hd <= 64, (heads, hp, hd)
    scale = 1.0 / math.sqrt(hd)
    S_p = ((S + 15) // 16) * 16                          # bf16 sublane tile
    qkv_p = _pad_to(qkv, 16, axis=1) if S_p != S else qkv
    W = hp * hd                                          # lane width

    def col_spec(group):
        # block (1, S_p, W) at columns group*D + p*W
        return pl.BlockSpec(
            (1, S_p, W), lambda b, p, g=group: (b, 0, (g * D) // W + p),
            memory_space=pltpu.VMEM)

    grid = (B, heads // hp)
    # a single input spec would need stride-D gathers; instead pass the
    # same array three times with per-group column indexing
    out = pl.pallas_call(
        functools.partial(_qkv_kernel_3in, kv_len=S, hd=hd, scale=scale,
                          hp=hp),
        grid=grid,
        in_specs=[col_spec(0), col_spec(1), col_spec(2)],
        out_specs=pl.BlockSpec((1, S_p, W), lambda b, p: (b, 0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S_p, D), qkv.dtype),
        interpret=interpret,
    )(qkv_p, qkv_p, qkv_p)
    return out[:, :S]


def _qkv_kernel_3in(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, hd: int,
                    scale: float, hp: int = 2):
    qb = q_ref[0].astype(jnp.float32)                   # [S_p, hp*hd]
    kb = k_ref[0].astype(jnp.float32)
    vb = v_ref[0].astype(jnp.float32)
    outs = []
    for h in range(hp):
        q = qb[:, h * hd:(h + 1) * hd] * scale
        k = kb[:, h * hd:(h + 1) * hd]
        v = vb[:, h * hd:(h + 1) * hd]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(k_pos < kv_len, logits, _NEG_INF)
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        out = jnp.dot(p, v, preferred_element_type=jnp.float32)
        outs.append(out / jnp.sum(p, axis=1, keepdims=True))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# MMDiT joint attention straight from the two streams' fused qkv matmul
# outputs: reads 128-lane head-pair column blocks from [B, S, 3D]
# (x-stream rows first, so tile padding is a maskable suffix), applies
# the per-stream RMS qk-norm IN KERNEL (f32, VMEM-resident), and writes
# the [B, S, D] attention output directly -- no head transposes, no 4-D
# concats, no separate qk-norm passes over HBM.  KV blocks are constant
# in the q-step axis so Mosaic keeps them resident per (batch, pair).
# ---------------------------------------------------------------------------

def _joint_qkv_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, *, kv_len: int,
                      sx: int, hd: int, bq: int, eps: float,
                      scale: float):
    i = pl.program_id(2)
    q = q_ref[0].astype(jnp.float32)                  # [bq, 2*hd]
    k = k_ref[0].astype(jnp.float32)                  # [Sp, 2*hd]
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)                # [4, 2*hd]

    def _norm(t, pos, g_x, g_c):
        halves = []
        for h in range(2):
            th = t[:, h * hd:(h + 1) * hd]
            var = jnp.mean(jnp.square(th), axis=-1, keepdims=True)
            halves.append(th * jax.lax.rsqrt(var + eps))
        tn = jnp.concatenate(halves, axis=1)
        gamma = jnp.where(pos[:, None] < sx, g_x[None, :], g_c[None, :])
        return tn * gamma

    qpos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq,), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (k.shape[0],), 0)
    q = _norm(q, qpos, g[0], g[1]) * scale
    k = _norm(k, kpos, g[2], g[3])

    outs = []
    for h in range(2):
        logits = jnp.dot(q[:, h * hd:(h + 1) * hd],
                         k[:, h * hd:(h + 1) * hd].T,
                         preferred_element_type=jnp.float32)
        logits = jnp.where(kpos[None, :] < kv_len, logits, _NEG_INF)
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        out = jnp.dot(p, v[:, h * hd:(h + 1) * hd],
                      preferred_element_type=jnp.float32)
        outs.append(out / jnp.sum(p, axis=1, keepdims=True))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "bq", "eps", "interpret"))
def joint_qkv_attention(qkv_x, qkv_c, heads: int, q_gamma_x, k_gamma_x,
                        q_gamma_c, k_gamma_c, eps: float = 1e-6,
                        bq: int = 0, interpret: bool = False):
    """qkv_x [B, Sx, 3D], qkv_c [B, Sc, 3D]: the two MMDiT streams'
    fused qkv projections (q|k|v groups, heads contiguously inside each).
    gammas [hd]: per-stream RMS qk-norm weights.  Returns the joint
    attention output [B, Sx+Sc, D] with x rows first.

    Requires head_dim 64 and even heads (128-lane blocks); bq must be a
    multiple of 16 (bf16 sublane tile) and the padded length Sp =
    ceil(S/bq)*bq a multiple of 128 (logits lane alignment).  bq=0
    auto-selects via `joint_bq_auto` (minimal padded K length, then the
    largest tile -- swept on TPU at the SD3.5 sequence lengths)."""
    B, Sx, threeD = qkv_x.shape
    Sc = qkv_c.shape[1]
    D = threeD // 3
    hd = D // heads
    S = Sx + Sc
    if bq == 0:
        bq = (_SWEEP_BQ(S) if _SWEEP_BQ is not None else None) \
            or joint_bq_auto(S)
    Sp = ((S + bq - 1) // bq) * bq
    assert hd == 64 and heads % 2 == 0 and bq % 16 == 0 and Sp % 128 == 0
    qkv = jnp.concatenate([qkv_x, qkv_c], axis=1)
    if Sp != S:
        qkv = jnp.pad(qkv, ((0, 0), (0, Sp - S), (0, 0)))

    gam = jnp.stack([
        jnp.tile(q_gamma_x.astype(jnp.float32), 2),
        jnp.tile(q_gamma_c.astype(jnp.float32), 2),
        jnp.tile(k_gamma_x.astype(jnp.float32), 2),
        jnp.tile(k_gamma_c.astype(jnp.float32), 2)], axis=0)  # [4, 128]

    W = 2 * hd
    nq = Sp // bq

    def col_spec(group, blocked_q=False):
        if blocked_q:
            return pl.BlockSpec((1, bq, W),
                                lambda b, p, i: (b, i, p),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (1, Sp, W), lambda b, p, i, g=group: (b, 0, (g * D) // W + p),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_joint_qkv_kernel, kv_len=S, sx=Sx, hd=hd,
                          bq=bq, eps=eps, scale=1.0 / math.sqrt(hd)),
        grid=(B, heads // 2, nq),
        in_specs=[col_spec(0, blocked_q=True), col_spec(1), col_spec(2),
                  pl.BlockSpec((4, W), lambda b, p, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bq, W), lambda b, p, i: (b, i, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sp, D), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, gam)
    return out[:, :S]


#: tools/joint_attn_sweep.py hook: a callable S -> bq (or None to fall
#: through to joint_bq_auto) applied when joint_qkv_attention is called
#: with bq=0.  Read at trace time; leave None in production.
_SWEEP_BQ = None


def joint_bq_auto(S: int) -> int:
    """Auto q-tile for `joint_qkv_attention`: among multiples of 16
    whose padded length Sp = ceil(S/bq)*bq is 128-aligned, minimize Sp
    (every program's K/V stream and logits width scale with Sp), then
    take the LARGEST tile (fewer grid steps amortize the VMEM-resident
    K/V better; measured at S=1101: bq 384 vs 128 at equal padding was
    18% faster).  Swept on TPU v5e at the SD3.5 shapes (S=1178 joint /
    1613 with T5-512 conditioning, tools/joint_attn_sweep.py)."""
    sp128 = -(-S // 128) * 128      # bq=128 always pads 128-aligned
    best = ((sp128, -128), 128)
    for bq in range(144, min(S + 15, 1024) + 1, 16):
        Sp = -(-S // bq) * bq
        if Sp % 128:
            continue
        key = (Sp, -bq)
        if key < best[0]:
            best = (key, bq)
    return best[1]


def use_joint_qkv_attention(seq_len: int, heads: int, head_dim: int,
                            qk_norm: bool) -> bool:
    return (jax.default_backend() == "tpu" and qk_norm
            and head_dim == 64 and heads % 2 == 0
            and seq_len <= _MID_MAX_KV)


def joint_qkv_reference(qkv_x, qkv_c, heads: int, q_gamma_x, k_gamma_x,
                        q_gamma_c, k_gamma_c, eps: float = 1e-6):
    """Composed-op joint attention from fused qkv activations (CPU /
    odd-shape fallback and the kernel's oracle): split + RMS qk-norm +
    softmax attention over [x | ctx] rows."""
    B, Sx, threeD = qkv_x.shape
    Sc = qkv_c.shape[1]
    D = threeD // 3
    hd = D // heads

    def rms(t, g):
        if g is None:                       # qk-norm disabled
            return t
        tf = t.astype(jnp.float32)
        var = jnp.mean(jnp.square(tf), axis=-1, keepdims=True)
        return (tf * jax.lax.rsqrt(var + eps)
                * g.astype(jnp.float32)).astype(t.dtype)

    def split(qkv, S):
        r = qkv.reshape(B, S, 3, heads, hd)
        return (r[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

    qx, kx, vx = split(qkv_x, Sx)
    qc, kc, vc = split(qkv_c, Sc)
    q = jnp.concatenate([rms(qx, q_gamma_x), rms(qc, q_gamma_c)], axis=2)
    k = jnp.concatenate([rms(kx, k_gamma_x), rms(kc, k_gamma_c)], axis=2)
    v = jnp.concatenate([vx, vc], axis=2)
    out = reference_attention(q, k, v)
    return out.transpose(0, 2, 1, 3).reshape(B, Sx + Sc, D)


def joint_qkv_dispatch(qkv_x, qkv_c, heads: int, q_gamma_x, k_gamma_x,
                       q_gamma_c, k_gamma_c, eps: float = 1e-6):
    """gammas may be None (qk_norm disabled) -- the Pallas kernel
    requires qk-norm, so that case uses the composed reference."""
    D = qkv_x.shape[-1] // 3
    hd = D // heads
    if use_joint_qkv_attention(qkv_x.shape[1] + qkv_c.shape[1], heads,
                               hd, q_gamma_x is not None):
        return joint_qkv_attention(qkv_x, qkv_c, heads, q_gamma_x,
                                   k_gamma_x, q_gamma_c, k_gamma_c,
                                   eps=eps)
    return joint_qkv_reference(qkv_x, qkv_c, heads, q_gamma_x, k_gamma_x,
                               q_gamma_c, k_gamma_c, eps=eps)


def self_qkv_dispatch(qkv, heads: int, q_gamma, k_gamma,
                      eps: float = 1e-6):
    """Single-stream specialization of the fused joint-qkv kernel: an
    empty ctx stream (Sc=0) reduces the joint attention to plain
    self-attention with in-kernel RMS qk-norm, still reading head-pair
    column blocks straight from the [B, S, 3D] qkv matmul output.  Used
    by the MMDiT-X dual-attention branch (SD3.5-medium blocks 0-12,
    S=1024 @512px -- tiles exactly at bq=512); diffusers analog is the
    plain attn2 self-attention.  gammas None -> composed reference."""
    return joint_qkv_dispatch(qkv, qkv[:, :0], heads, q_gamma, k_gamma,
                              q_gamma, k_gamma, eps=eps)


def joint_qkv_attention_tp(qkv_x, qkv_c, heads: int, q_gamma_x,
                           k_gamma_x, q_gamma_c, k_gamma_c, mesh,
                           axis: str = "mp", eps: float = 1e-6):
    """Tensor-parallel MMDiT joint attention: both streams' qkv
    activations sharded on the last axis over `axis` in the head-blocked
    TP layout (qkv_tp_permutation applied to the qkv weights by
    parallel/mesh.shard_mmdit_params).  Each shard runs the fused kernel
    (or the composed fallback) on its local heads; zero collectives
    inside -- the row-parallel proj matmul downstream carries the psum.
    qk-norm gammas are per-head-channel and replicated."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape[axis]
    assert heads % mp == 0, (heads, mp)
    batch_axis = ("dp" if "dp" in mesh.axis_names
                  and qkv_x.shape[0] % mesh.shape["dp"] == 0 else None)

    if q_gamma_x is None:
        def _local_nonorm(ax, ac):
            return joint_qkv_dispatch(ax, ac, heads // mp, None, None,
                                      None, None, eps=eps)
        fn = shard_map(
            _local_nonorm, mesh=mesh,
            in_specs=(P(batch_axis, None, axis),
                      P(batch_axis, None, axis)),
            out_specs=P(batch_axis, None, axis),
            check_vma=False)
        return fn(qkv_x, qkv_c)

    def _local(ax, ac, gqx, gkx, gqc, gkc):
        return joint_qkv_dispatch(ax, ac, heads // mp, gqx, gkx, gqc,
                                  gkc, eps=eps)

    fn = shard_map(
        _local, mesh=mesh,
        in_specs=(P(batch_axis, None, axis), P(batch_axis, None, axis),
                  P(), P(), P(), P()),
        out_specs=P(batch_axis, None, axis),
        check_vma=False)
    return fn(qkv_x, qkv_c, q_gamma_x, k_gamma_x, q_gamma_c, k_gamma_c)
