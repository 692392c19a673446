"""Bisect the fused+T5 text-query compile failure (round 5).

BENCH r5 run 1: the fused text-query program WITH T5-XXL conditioning
fails to compile on an EMPTY chip -- `remote_compile HTTP 500:
tpu_compile_helper subprocess exit code 1` -- while the identical
program without T5 compiles in 105 s.  This tool AOT-compiles (from
eval_shape avals, zero device memory) a ladder of programs between
"T5 encode alone" and "the full fused text query with T5" to find the
smallest failing one.

Run ALONE on the TPU (one-process rule).  Each rung prints PASS/FAIL
+ compile seconds; failures don't stop the ladder.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rung(name, build):
    t0 = time.perf_counter()
    try:
        lowered = build()
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        print(f"PASS  {name:<42} lower {t_lower:6.1f}s  "
              f"compile {time.perf_counter() - t0:6.1f}s", flush=True)
        return True
    except Exception as e:                      # noqa: BLE001
        print(f"FAIL  {name:<42} {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return False


def main():
    import jax
    import jax.numpy as jnp

    from bsc_nav_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from bench import _make_imagination
    from bsc_nav_tpu.config import Config, MemoryConfig
    from bsc_nav_tpu.memory.pipeline import (make_query_step,
                                             make_text_query_step)
    from bsc_nav_tpu.memory.store import init_store
    from bsc_nav_tpu.models import t5 as T5
    from bsc_nav_tpu.models import vit

    log(f"devices: {jax.devices()}")
    imag = _make_imagination(True, use_t5=True, abstract=True)
    imag_no = _make_imagination(True, use_t5=False, abstract=True)
    vit_cfg = vit.DINOV2_VITL14_REG
    vparams_s = jax.eval_shape(
        lambda k: vit.quantize_params(
            vit.init_params(vit_cfg, k, dtype=jnp.bfloat16)),
        jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)
    inputs = imag.prep_inputs("a red leather sofa in a living room")
    inputs_no = imag_no.prep_inputs("a red leather sofa in a living room")

    # 1. T5-XXL int8 encode alone (S=512)
    t5p_s = jax.eval_shape(
        lambda k: T5.init_params_q8(T5.T5_XXL, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(6))
    ids = jnp.zeros((1, 512), jnp.int32)
    rung("t5-xxl int8 encode S=512",
         lambda: jax.jit(lambda p, i: T5.encode(p, i, T5.T5_XXL)
                         ).lower(t5p_s, ids))

    # 2. the two-program tier's imagination program (T5 + CLIPs +
    #    MMDiT 28-step CFG sampler + VAE decode)
    rung("imagination._run with T5 (two-program tier)",
         lambda: jax.jit(imag.imagine_core).lower(
             imag.mmdit_params, imag.vae_params, imag.text_params,
             imag.t5_params, *inputs, key))

    # 3. encode+localize alone at the bench store shape
    cfg = Config(memory=MemoryConfig(voxel_capacity=(1 << 18) - 8))
    state_s = jax.eval_shape(
        lambda: init_store(cfg.memory, store_dtype=jnp.bfloat16))
    qs = make_query_step(cfg, vit_cfg, compute_dtype=jnp.bfloat16)
    qimg = jnp.zeros((3, 512, 512, 3), jnp.uint8)
    rung("dinov2 encode + localize (bench store)",
         lambda: qs.lower(state_s, vparams_s, qimg, top_k=100))

    # 4. fused text query WITH t5, SMALL store (program size probe)
    cfg_small = Config(memory=MemoryConfig(
        voxel_capacity=(1 << 14) - 8))
    state_small_s = jax.eval_shape(
        lambda: init_store(cfg_small.memory, store_dtype=jnp.bfloat16))
    tq_small = make_text_query_step(cfg_small, vit_cfg, imag,
                                    compute_dtype=jnp.bfloat16)
    rung("fused textq + t5, small store (2^14)",
         lambda: tq_small.lower(
             state_small_s, vparams_s, imag.mmdit_params,
             imag.vae_params, imag.text_params, imag.t5_params,
             *inputs, key, top_k=100))

    # 5. the full failing program (confirmation)
    tq = make_text_query_step(cfg, vit_cfg, imag,
                              compute_dtype=jnp.bfloat16)
    rung("fused textq + t5, bench store (2^18)",
         lambda: tq.lower(
             state_s, vparams_s, imag.mmdit_params, imag.vae_params,
             imag.text_params, imag.t5_params, *inputs, key, top_k=100))


if __name__ == "__main__":
    main()
