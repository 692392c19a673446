"""Pallas implicit-GEMM 3x3 conv vs lax.conv oracle (interpret mode on
CPU; the perf claim is measured on TPU in tools/yolo_profile.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsc_nav_tpu.ops.conv2d import conv3x3_s1, fold_bn


@pytest.mark.parametrize("B,H,W,C,CO,th", [
    (1, 16, 16, 128, 128, 8),
    (2, 8, 24, 128, 256, 4),
])
def test_conv3x3_matches_lax(B, H, W, C, CO, th):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    w = (rng.normal(size=(3, 3, C, CO)) / np.sqrt(9 * C)).astype(
        np.float32)
    bias = rng.normal(size=(CO,)).astype(np.float32)

    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + bias
    want = want * jax.nn.sigmoid(want)           # silu

    got = conv3x3_s1(jnp.asarray(x), jnp.asarray(w.reshape(9, C, CO)),
                     jnp.asarray(bias), act="silu", th=th,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fold_bn_matches_conv_bn_silu():
    rng = np.random.default_rng(1)
    B, H, W, C, CO = 1, 8, 8, 128, 128
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    w = (rng.normal(size=(3, 3, C, CO)) / np.sqrt(9 * C)).astype(
        np.float32)
    sc = rng.uniform(0.5, 1.5, CO).astype(np.float32)
    bi = rng.normal(size=CO).astype(np.float32)
    mu = rng.normal(size=CO).astype(np.float32)
    var = rng.uniform(0.5, 2.0, CO).astype(np.float32)

    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = (y - mu) / jnp.sqrt(var + 1e-3) * sc + bi
    want = y * jax.nn.sigmoid(y)

    w9, b = fold_bn(jnp.asarray(w), jnp.asarray(sc), jnp.asarray(bi),
                    jnp.asarray(mu), jnp.asarray(var))
    got = conv3x3_s1(jnp.asarray(x), w9, b, act="silu", th=4,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
