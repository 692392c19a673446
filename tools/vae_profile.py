"""VAE decoder timing on the real TPU (text-query stage owner).

Times SD3-VAE decode of b3 64^2x16 latents -> 3x512^2 RGB (the
imagination path's decode shape, bench.py text phase) plus the per-
resolution stage split.  Run alone on the TPU (one-process rule).

  python tools/vae_profile.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/bsc_nav_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from bsc_nav_tpu.models import vae as V

    full = jax.default_backend() == "tpu"
    cfg = V.SD3_VAE if full else V.VAE_TEST
    log(f"backend: {jax.default_backend()} cfg: {cfg}")

    params = V.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 64,
                                                    cfg.latent_channels),
                            jnp.bfloat16)

    dec = jax.jit(lambda p, z: jnp.sum(
        V.decode(p, z, cfg).astype(jnp.float32)))

    t0 = time.perf_counter()
    _ = float(dec(params, lat))
    log(f"compile+first: {time.perf_counter()-t0:.1f}s")
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        _ = float(dec(params, lat))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts) * 1000)
    log(f"vae decode 3x512^2: {ms:.1f} ms")
    import json
    print(json.dumps({"vae_decode_b3_512_ms": round(ms, 1)}))


if __name__ == "__main__":
    main()
