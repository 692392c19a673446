"""Segmented-store bench on real TPU (VERDICT r3 item 6).

The reference's equivalent of segment spill is its HDF5 chunked scan --
its #2 hot loop (reference memory_2.py:623-667, batch-300 group reads per
query).  `memory/segments.py` replaces that with capacity-bounded store
segments: device-resident while they fit, host-spilled beyond, streamed
back through the chip at query time.  This tool measures what that
actually costs through the tunnel:

  1. raw host<->device transfer bandwidth at segment-scale payloads
     (the restream's speed-of-light);
  2. build continuity across a segment rotation (freeze + spill cost
     visible as a per-batch time spike);
  3. query p50 vs segment placement: active only, +1 device-frozen,
     +1/+2 host-spilled;
  4. extrapolation of the per-query restream cost to full-scale
     segments (voxel_capacity = (1<<18)-8) in bf16 and int8.

Env knobs: SEG_CAP (per-segment voxel capacity, default (1<<16)-8),
SEG_DTYPE (bf16|int8, default bf16), SEG_BATCH (default 32).

Writes tools/segments_bench.last.json; human-readable rows on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    """Value-materializing sync (block_until_ready is unreliable through
    the tunnel, CLAUDE.md)."""
    return float(np.asarray(x).ravel()[0])


def bandwidth_probe(jnp, mb=512):
    """Measured h2d / d2h GB/s at a restream-sized payload."""
    host = np.random.default_rng(0).integers(
        0, 255, size=(mb << 20,), dtype=np.uint8).view(np.int8)
    # warm the path once (allocator, tunnel framing)
    d = jnp.asarray(host[: 1 << 20]); _sync(d[:1]); del d
    t0 = time.perf_counter()
    dev = jnp.asarray(host)
    _sync(dev[:1])
    h2d = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = np.asarray(dev)
    d2h = time.perf_counter() - t0
    del dev, back
    nbytes = host.nbytes
    return nbytes / h2d / 1e9, nbytes / d2h / 1e9, nbytes


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from bsc_nav_tpu.config import Config, MemoryConfig
    from bsc_nav_tpu.memory.pipeline import make_build_step
    from bsc_nav_tpu.memory.segments import SegmentedStore
    from bsc_nav_tpu.models import vit

    print("devices:", jax.devices(), flush=True)
    results = {"devices": str(jax.devices())}

    # ---- 1. tunnel bandwidth at restream scale --------------------------
    h2d_gbs, d2h_gbs, probe_bytes = bandwidth_probe(jnp)
    print(f"tunnel bandwidth ({probe_bytes/1e6:.0f} MB probe): "
          f"h2d {h2d_gbs:.2f} GB/s, d2h {d2h_gbs:.2f} GB/s", flush=True)
    results["h2d_gb_per_s"] = round(h2d_gbs, 2)
    results["d2h_gb_per_s"] = round(d2h_gbs, 2)

    # ---- build across rotations ----------------------------------------
    tiny = bool(os.environ.get("SEG_TINY"))    # CPU shakeout mode
    cap = int(os.environ.get("SEG_CAP",
                             (1 << 12) - 8 if tiny else (1 << 16) - 8))
    store_dtype = (jnp.int8 if os.environ.get("SEG_DTYPE") == "int8"
                   else jnp.bfloat16)
    B = int(os.environ.get("SEG_BATCH", 4 if tiny else 32))
    cfg = Config(memory=MemoryConfig(voxel_capacity=cap)
                 if not tiny else
                 MemoryConfig(grid_size=128, token_dim=256,
                              voxel_capacity=cap))
    vit_cfg = vit.DINOV2_VITL14_REG if not tiny else vit.ViTConfig(
        img_size=224, patch_size=14, dim=256, depth=2, heads=4,
        num_registers=4)
    from bsc_nav_tpu.utils.compile_cache import jit_init
    params = jit_init(
        lambda k: vit.init_params(vit_cfg, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0), vit.quantize_params)
    build_step = make_build_step(cfg, vit_cfg, compute_dtype=jnp.bfloat16)

    H, W = cfg.sensor.height, cfg.sensor.width
    rng = np.random.default_rng(0)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        rgb = r.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8)
        depth = r.uniform(0.3, 9.0, size=(B, H, W)).astype(np.float32)
        poses = np.zeros((B, 7), np.float32)
        # spread poses so fresh batches keep opening new voxels
        poses[:, :3] = r.uniform(-18, 18, size=(B, 3))
        poses[:, 6] = 1.0
        return (jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(poses))

    batches = [make_batch(s) for s in range(6)]

    seg = SegmentedStore(cfg.memory, store_dtype=store_dtype,
                         max_device_segments=1)
    key = jax.random.PRNGKey(0)

    # warm compile outside the timed region
    carry, stats = build_step((seg.state, key), params, *batches[0])
    _ = int(stats["num_voxels"])
    seg.state, key = carry

    batch_ms, rotations = [], []
    seg_bytes = int(seg.state.feats.nbytes)
    i = 0
    while len(rotations) < 2 and i < 60:
        t0 = time.perf_counter()
        carry, stats = build_step((seg.state, key), params,
                                  *batches[i % len(batches)])
        seg.state, key = carry
        nv = int(stats["num_voxels"])          # forces execution
        step_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        rotated = seg.rotate_if_full()
        rot_s = time.perf_counter() - t0
        batch_ms.append(round(step_s * 1000, 1))
        if rotated:
            rotations.append({
                "at_batch": i, "voxels": nv,
                "rotate_ms": round(rot_s * 1000, 1),
                "spilled": len(seg.host_segments) > 0,
            })
            print(f"batch {i}: ROTATED at {nv} voxels, rotate cost "
                  f"{rot_s*1000:.0f} ms (host segments: "
                  f"{len(seg.host_segments)})", flush=True)
        i += 1
    med_batch = float(np.median(batch_ms))
    print(f"build: {i} batches of {B} frames, median {med_batch:.0f} "
          f"ms/batch -> {B/med_batch*1000:.1f} fps; rotations: "
          f"{rotations}", flush=True)
    results["segment_bytes"] = seg_bytes
    results["store_dtype"] = ("int8" if store_dtype == jnp.int8
                              else "bfloat16")
    results["build_median_ms_per_batch"] = round(med_batch, 1)
    results["build_fps"] = round(B / med_batch * 1000, 1)
    results["rotations"] = rotations

    # ---- query p50 vs segment placement ---------------------------------
    D = cfg.memory.token_dim
    q = rng.normal(size=(D,)).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q))

    def query_p50(tag, reps=5):
        seg.localize(q, top_k=100)             # warm trace
        lat = []
        for _ in range(reps):
            t0 = time.perf_counter()
            pos, score = seg.localize(q, top_k=100)
            lat.append(time.perf_counter() - t0)
        p50 = float(np.median(lat) * 1000)
        print(f"query [{tag}]: p50 {p50:.1f} ms "
              f"(segments: 1 active + {len(seg.device_segments)} device "
              f"+ {len(seg.host_segments)} host)", flush=True)
        return p50

    # current state after the build loop: 1 active + 1 device + 1 host
    # (host-segment queries restream ~0.7-1.3 GB at the tunnel's
    # 0.03 GB/s — measure with fewer reps, the variance is tiny
    # relative to the 20-40 s magnitude)
    rows = {}
    rows["active+dev1+host1"] = query_p50("active + 1 dev + 1 host",
                                          reps=3)

    # drop back: move the host segment away to time the no-spill configs
    host_backup = seg.host_segments
    seg.host_segments = []
    rows["active+dev1"] = query_p50("active + 1 device-frozen")
    dev_backup = seg.device_segments
    seg.device_segments = []
    rows["active_only"] = query_p50("active only")
    seg.device_segments = dev_backup
    seg.host_segments = host_backup

    results["query_p50_ms"] = {k: round(v, 1) for k, v in rows.items()}
    per_spill_ms = rows["active+dev1+host1"] - rows["active+dev1"]
    per_devfrozen_ms = rows["active+dev1"] - rows["active_only"]
    results["per_spilled_segment_ms"] = round(per_spill_ms, 1)
    results["per_device_segment_ms"] = round(per_devfrozen_ms, 1)

    # ---- extrapolation to full-scale segments ---------------------------
    full_cap = (1 << 18) - 8
    K = cfg.memory.cache_size
    # restream payload = feats + feat_norm(f32) per spilled segment
    for name, isz in (("bf16", 2), ("int8", 1)):
        payload = full_cap * K * D * isz + full_cap * K * 4
        est_ms = payload / (h2d_gbs * 1e9) * 1000
        results[f"full_segment_restream_est_ms_{name}"] = round(est_ms, 0)
        print(f"full-scale spilled-segment restream estimate ({name}): "
              f"{payload/1e9:.2f} GB -> ~{est_ms:.0f} ms/query at "
              f"{h2d_gbs:.2f} GB/s", flush=True)

    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, "segments_bench.last.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
