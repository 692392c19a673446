"""Multi-chip sharding validation on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from bsc_nav_tpu.parallel import mesh as M
from bsc_nav_tpu.parallel.dryrun import dryrun_multichip
from bsc_nav_tpu.models import vit


def test_mesh_construction():
    mesh = M.make_mesh(dp=4, mp=2)
    assert mesh.shape == {"dp": 4, "mp": 2}


def test_vit_param_tp_sharding():
    mesh = M.make_mesh(dp=2, mp=4)
    cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=64, depth=2, heads=4,
                        num_registers=1)
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    sharded = M.shard_vit_params(params, mesh)
    qkv_w = sharded["blocks"][0]["qkv"]["w"]
    # column-parallel: output dim sharded over mp=4
    shard_shapes = {s.data.shape for s in qkv_w.addressable_shards}
    assert shard_shapes == {(64, 3 * 64 // 4)}
    proj_w = sharded["blocks"][0]["proj"]["w"]
    shard_shapes = {s.data.shape for s in proj_w.addressable_shards}
    assert shard_shapes == {(64 // 4, 64)}


def test_dryrun_multichip_8():
    dryrun_multichip(8)


def test_dryrun_multichip_2():
    dryrun_multichip(2)
