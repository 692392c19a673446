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

    from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

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

    # ---- stage split (isolated sub-programs; in-context A/B is the
    # truth for any candidate change, this is for triage only) --------
    def timeit(fn, *args, n=5):
        _ = float(fn(*args))
        tt = []
        for _ in range(n):
            t0 = time.perf_counter()
            _ = float(fn(*args))
            tt.append(time.perf_counter() - t0)
        return float(np.median(tt) * 1000)

    # cumulative PREFIXES of the real program (isolated per-stage
    # programs mis-compile and each sync pays ~30 ms tunnel RTT, so
    # successive differences of prefixes are the honest split)
    def prefix(n_stages, with_mid=True, with_out=False):
        def f(p, z):
            x = V._conv(z / cfg.scaling_factor + cfg.shift_factor,
                        p["conv_in"])
            if with_mid:
                x = V._resnet(x, p["mid_res1"], cfg.groups)
                x = V._mid_attention(x, p["mid_attn"], cfg.groups)
                x = V._resnet(x, p["mid_res2"], cfg.groups)
            for stage in p["stages"][:n_stages]:
                for r in stage["res"]:
                    x = V._resnet(x, r, cfg.groups)
                if "upconv" in stage:
                    x = V._conv(V._upsample(x), stage["upconv"])
            if with_out:
                x = jax.nn.silu(V._group_norm(x, p["gn_out"], cfg.groups))
                x = V._conv(x, p["conv_out"])
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(f)

    cum = [("conv_in", timeit(prefix(0, with_mid=False), params, lat)),
           ("mid_64", timeit(prefix(0), params, lat))]
    for si in range(len(params["stages"])):
        cum.append((f"stage{si}", timeit(prefix(si + 1), params, lat)))
    cum.append(("gn_out+conv_out",
                timeit(prefix(len(params["stages"]), with_out=True),
                       params, lat)))
    split = {}
    prev = 0.0
    for name, t in cum:
        split[name] = t - prev
        log(f"  {name:<18} cum {t:8.1f} ms   delta {t - prev:8.1f} ms")
        prev = t
    log(f"  (deltas are net of the constant per-program sync RTT)")
    import json
    print(json.dumps({"vae_decode_b3_512_ms": round(ms, 1),
                      "stages_ms": {k: round(v, 1)
                                    for k, v in split.items()}}))


if __name__ == "__main__":
    main()
