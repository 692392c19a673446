"""Pallas layer-norm kernel vs the jnp oracle (interpret mode on CPU;
the perf claim -- LN stat reductions were 20.5 of the ViT-L encoder's
36 ms -- is measured on TPU in tools/vit_profile.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bsc_nav_tpu.ops.layernorm import layer_norm_tpu
from bsc_nav_tpu.models.vit import layer_norm


@pytest.mark.parametrize("shape,dtype,bm", [
    ((4, 261, 1024), np.float32, 256),     # ViT-L token grid
    ((2, 77, 1280), np.float32, 256),      # CLIP-H text (M=154 < bm pad)
    ((3, 128), "bfloat16", 64),            # rank-2, bf16
    ((1, 1101, 1536), np.float32, 384),    # MMDiT joint stream
])
def test_layer_norm_kernel_matches_oracle(shape, dtype, bm):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=shape) * 3 + 1).astype(np.float32)
    d = shape[-1]
    scale = rng.normal(size=(d,)).astype(np.float32)
    bias = rng.normal(size=(d,)).astype(np.float32)
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}

    xj = jnp.asarray(x, dtype=jnp.dtype(dtype))
    want = layer_norm(xj, p, 1e-6)
    got = layer_norm_tpu(xj, p["scale"], p["bias"], eps=1e-6, bm=bm,
                         interpret=True)
    assert got.dtype == xj.dtype
    tol = 2e-2 if dtype == "bfloat16" else 2e-5
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol)
