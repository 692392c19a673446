"""utils/compile_cache: persistent-cache setup + one-program param init.

The module exists because of two measured platform costs (CLAUDE.md):
pallas-bearing programs never hit the persistent cache across caller
source edits unless ``jax_include_full_tracebacks_in_locations`` is
False, and eager per-leaf init pays ~1 ms tunnel dispatch per leaf.
These tests pin the semantics (flag set, init/quantize equivalence,
eager fallback), not the timings.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache, jit_init


def test_enable_persistent_cache_sets_flags(tmp_path):
    enable_persistent_cache(cache_dir=str(tmp_path))
    assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    assert jax.config.jax_include_full_tracebacks_in_locations is False
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 5.0


def test_jit_init_matches_eager_init():
    def init(key):
        k1, k2 = jax.random.split(key)
        return {"w": jax.random.normal(k1, (8, 16), jnp.float32),
                "b": jax.random.normal(k2, (16,), jnp.float32)}

    key = jax.random.PRNGKey(7)
    got = jit_init(init, key)
    want = init(key)
    assert set(got) == {"w", "b"}
    np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(want["w"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["b"]), np.asarray(want["b"]),
                               rtol=1e-6)


def test_jit_init_folds_quantize():
    from bsc_nav_tpu.models import vit

    cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=64, depth=1,
                        heads=2, num_registers=1)
    key = jax.random.PRNGKey(0)
    got = jit_init(lambda k: vit.init_params(cfg, k, dtype=jnp.bfloat16),
                   key, vit.quantize_params)
    want = vit.quantize_params(vit.init_params(cfg, key, dtype=jnp.bfloat16))
    got_leaves = jax.tree_util.tree_leaves_with_path(got)
    want_map = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(got_leaves) == len(want_map)
    saw_int8 = False
    for path, leaf in got_leaves:
        w = want_map[path]
        assert leaf.dtype == w.dtype and leaf.shape == w.shape
        saw_int8 |= leaf.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(w))
    assert saw_int8, "quantize_params should have produced int8 leaves"


def test_jit_init_falls_back_to_eager_for_host_numpy_init():
    def host_init(key):
        # np.asarray on a tracer raises -> jit_init must fall back
        seed = int(np.asarray(key)[0])
        return {"w": np.full((4,), float(seed % 97), np.float32)}

    got = jit_init(host_init, jax.random.PRNGKey(3))
    want = host_init(jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(got["w"]), want["w"])
