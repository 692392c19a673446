"""Persistent-compile-cache setup shared by every entry point.

Two settings matter on this platform:

  - ``jax_compilation_cache_dir``: the big pipelines cost minutes to
    compile cold through the tunnel (ViT-L ~250 s, fused text query
    ~120 s); the cache reloads them in seconds.

  - ``jax_include_full_tracebacks_in_locations = False``: WITHOUT this
    the cache NEVER hits across source edits for any program containing
    a Pallas kernel.  JAX embeds the full user traceback in MLIR
    locations; the outer module's locations are stripped before the
    cache key is computed (``strip-debuginfo``), but the Mosaic kernel
    rides inside the ``tpu_custom_call`` backend_config as an opaque
    serialized payload whose OWN location info the pass cannot reach —
    so shifting ANY caller line (editing bench.py, an agent file, even
    adding a comment) changed the key and forced a full recompile of
    every pallas-bearing program (measured round 4: byte-level diff of
    the canonicalized module pinned the drift to varint line numbers in
    the payload; with the flag off, canonical bytes are identical
    across caller layouts).  Single-frame locations (the kernel body's
    own file:line) remain, so editing the kernel file itself still
    invalidates — which is exactly right.
"""

from __future__ import annotations

import os

#: default cache location: INSIDE the repo (gitignored), not /tmp.
#: Round 4's driver run paid an 85.9 s cold imagination init despite a
#: warm builder-session cache because /tmp is wiped between sessions —
#: the repo directory is the only path that persists with the code it
#: caches for.  JAX_CACHE_DIR still overrides.
_DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 5.0) -> None:
    """Idempotent; call before the first device access for full effect."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        cache_dir or os.environ.get("JAX_CACHE_DIR", _DEFAULT_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_include_full_tracebacks_in_locations", False)


def jit_init(init_fn, key, quantize_fn=None):
    """Random-init (and optionally quantize) model params in ONE jitted
    program.

    Eager init_params pays one ~1 ms tunnel dispatch plus a fresh tiny
    RNG program per leaf; for SD3.5-medium (2.45B params) that measured
    130 s eager vs 37 s jitted cold — and the jitted program is
    persistent-cacheable (no pallas), so warm sessions pay seconds.
    quantize_fn (e.g. mmdit.quantize_params) folds into the same
    program.  Falls back to eager if the init function is not traceable
    (host-side numpy init)."""
    import jax

    fn = (lambda k: quantize_fn(init_fn(k))) if quantize_fn else init_fn
    try:
        params = jax.jit(fn)(key)
    except Exception:                    # noqa: BLE001 (host-numpy init)
        return fn(key)
    # materialize before returning: async dispatch would otherwise bill
    # the whole init execution to the CALLER's first timed program
    # (block_until_ready is unreliable through the tunnel — sync by
    # reading one element)
    import numpy as np
    leaf = jax.tree_util.tree_leaves(params)[0]
    np.asarray(jax.numpy.reshape(leaf, (-1,))[0])
    return params
