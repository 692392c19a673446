"""Fused text-query parity: the single-program
text -> imagination -> DINOv2 encode -> localize step
(memory.pipeline.make_text_query_step) must produce the same top-K as
the reference-shaped two-stage flow (imaginary() images synced to host,
then query_step) -- reference memory_2.py:258-276 + :563-671.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsc_nav_tpu.agents.spatial_memory import Perception, VoxelTokenMemory
from bsc_nav_tpu.config import small_test_config
from bsc_nav_tpu.memory.pipeline import (
    make_build_step, make_query_step, make_text_query_step)
from bsc_nav_tpu.memory.store import init_store
from bsc_nav_tpu.models import clip as CL
from bsc_nav_tpu.models import mmdit as M
from bsc_nav_tpu.models import tokenizer as T
from bsc_nav_tpu.models import vae as V
from bsc_nav_tpu.models import vit


VIT_CFG = vit.ViTConfig(img_size=56, patch_size=14, dim=32, depth=2,
                        heads=2, num_registers=1)


def _cfg():
    cfg = small_test_config()
    return cfg.replace(query=cfg.query.__class__(
        top_k=16, query_width=56, query_height=56))


def _make_imagination(seed_base: int = 0):
    """Tiny but real diffusion stack (SD3.5-shaped triple-encoder
    conditioning: CLIP-L + CLIP-G); two identically-seeded copies let
    the fused and two-stage paths consume the same key stream."""
    mcfg = M.MMDIT_TEST
    vcfg = V.VAE_TEST.__class__(
        latent_channels=mcfg.in_channels, base_channels=16,
        channel_mults=(1, 2), blocks_per_stage=1, groups=4,
        scaling_factor=1.0, shift_factor=0.0)
    return DiffusionImaginationFactory(mcfg, vcfg, seed_base)


class DiffusionImaginationFactory:
    def __init__(self, mcfg, vcfg, seed_base):
        self.mcfg, self.vcfg = mcfg, vcfg
        self.lcfg, self.gcfg = CL.SD3_CLIP_L_TEST, CL.SD3_CLIP_G_TEST
        self.seed_base = seed_base

    def new(self):
        from bsc_nav_tpu.models.imagination import DiffusionImagination
        k = self.seed_base
        return DiffusionImagination(
            mmdit_params=M.init_params(self.mcfg, jax.random.PRNGKey(k + 1)),
            mmdit_cfg=self.mcfg,
            vae_params=V.init_params(self.vcfg, jax.random.PRNGKey(k + 2)),
            vae_cfg=self.vcfg,
            clip_l_params=CL.init_text_params(
                self.lcfg, jax.random.PRNGKey(k + 3)),
            clip_l_cfg=self.lcfg,
            clip_g_params=CL.init_text_params(
                self.gcfg, jax.random.PRNGKey(k + 4)),
            clip_g_cfg=self.gcfg,
            tokenizer=T.HashTokenizer(vocab_size=self.lcfg.vocab_size,
                                      context_length=self.lcfg.context_length),
            num_images=2, num_steps=2, seed=k + 7)


@pytest.fixture(scope="module")
def built_store():
    cfg = _cfg()
    params = vit.init_params(VIT_CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, H, W = 6, cfg.sensor.height, cfg.sensor.width
    rgb = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    depth = jnp.asarray(rng.uniform(0.5, 3.0, (B, H, W)).astype(np.float32))
    yaws = np.linspace(0, 2 * np.pi, B, endpoint=False)
    poses = np.zeros((B, 7), np.float32)
    poses[:, 4] = np.sin(yaws / 2)      # quaternion about +y
    poses[:, 6] = np.cos(yaws / 2)
    state = init_store(cfg.memory)
    carry, _ = make_build_step(cfg, VIT_CFG)(
        (state, jax.random.PRNGKey(5)), params, rgb, depth,
        jnp.asarray(poses))
    state = carry[0]
    assert int(state.num_voxels) > 50
    return cfg, state, params


def test_fused_matches_two_stage(built_store):
    cfg, state, params = built_store
    factory = _make_imagination()
    im_a, im_b = factory.new(), factory.new()

    prompt = "a red sofa"
    # two-stage (reference shape): imagined images synced to host uint8,
    # then a separate query dispatch
    imgs_host = im_a(prompt)
    qstep = make_query_step(cfg, VIT_CFG)
    pos2, sc2 = qstep(state, params, jnp.asarray(imgs_host), top_k=16)

    # fused single program
    tq = make_text_query_step(cfg, VIT_CFG, im_b)
    pos1, sc1, imgs_dev = tq(
        state, params, im_b.mmdit_params, im_b.vae_params,
        im_b.text_params, im_b.t5_params,
        *im_b.prep_inputs(prompt), im_b.next_key(), top_k=16)

    # identical key stream -> identical imagined images (allow off-by-one
    # uint8 rounding under re-fused float order)
    diff = np.abs(np.asarray(imgs_dev, np.int32)
                  - imgs_host.astype(np.int32))
    assert diff.max() <= 1

    sc1, sc2 = np.asarray(sc1), np.asarray(sc2)
    np.testing.assert_allclose(sc1, sc2, rtol=1e-4, atol=1e-5)
    # positions must agree wherever scores are distinct enough to order
    stable = np.abs(sc2[:-1] - sc2[1:]) > 1e-5
    keep = np.concatenate([[True], stable]) & np.concatenate(
        [stable, [True]])
    np.testing.assert_array_equal(np.asarray(pos1)[keep],
                                  np.asarray(pos2)[keep])


def test_split_matches_fused(built_store):
    """Split (imagination+encode+pool program device-chained into the
    localize program) must equal the fused single program -- the split
    exists because fused + T5 + production store exceeds the TPU
    compile server (tools/t5_compile_bisect.py, round 5)."""
    from bsc_nav_tpu.memory.pipeline import make_text_pool_step
    from bsc_nav_tpu.memory.query import localize

    cfg, state, params = built_store
    factory = _make_imagination(seed_base=20)
    im_a, im_b = factory.new(), factory.new()
    prompt = "a red sofa"

    tq = make_text_query_step(cfg, VIT_CFG, im_a)
    pos1, sc1, imgs1 = tq(
        state, params, im_a.mmdit_params, im_a.vae_params,
        im_a.text_params, im_a.t5_params,
        *im_a.prep_inputs(prompt), im_a.next_key(), top_k=16)

    ps = make_text_pool_step(cfg, VIT_CFG, im_b)
    pooled, imgs2 = ps(params, im_b.mmdit_params, im_b.vae_params,
                       im_b.text_params, im_b.t5_params,
                       *im_b.prep_inputs(prompt), im_b.next_key())
    pos2, sc2 = localize(state, pooled, top_k=16)

    assert np.abs(np.asarray(imgs1, np.int32)
                  - np.asarray(imgs2, np.int32)).max() <= 1
    sc1, sc2 = np.asarray(sc1), np.asarray(sc2)
    np.testing.assert_allclose(sc1, sc2, rtol=1e-4, atol=1e-5)
    stable = np.abs(sc1[:-1] - sc1[1:]) > 1e-5
    keep = np.concatenate([[True], stable]) & np.concatenate(
        [stable, [True]])
    np.testing.assert_array_equal(np.asarray(pos1)[keep],
                                  np.asarray(pos2)[keep])


def test_agent_split_path(built_store):
    """VoxelTokenMemory with text_query_split=True serves the same
    answers through voxel_localized, including the mask kwargs."""
    cfg, state, params = built_store
    factory = _make_imagination(seed_base=30)
    im_s, im_f = factory.new(), factory.new()

    def mem_with(imagination, split):
        m = VoxelTokenMemory(
            cfg, env=None,
            perception=Perception.create(cfg, vit_cfg=VIT_CFG,
                                         vit_params=params),
            imagination=imagination, text_query_split=split)
        m.state = state
        return m

    mem_s = mem_with(im_s, True)
    mem_f = mem_with(im_f, False)
    best_s, top_s, sims_s = mem_s.voxel_localized("a potted plant", K=8)
    assert mem_s._text_pool_step is not None
    assert mem_s._text_query_step is None
    best_f, top_f, sims_f = mem_f.voxel_localized("a potted plant", K=8)
    np.testing.assert_allclose(sims_s, sims_f, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(best_s, best_f)

    # masks flow through the split's localize kwargs
    r_best, r_top, r_sims = mem_s.voxel_localized(
        "a potted plant", K=8, region_radius=2.0,
        curr_grid=np.asarray(top_s[0]))
    assert len(r_sims) <= len(sims_s)


def test_agent_uses_fused_path(built_store):
    cfg, state, params = built_store
    factory = _make_imagination(seed_base=10)
    im_fused, im_plain = factory.new(), factory.new()

    class PlainImagination:
        """Callable-only protocol: forces the agent's two-stage path."""
        def __init__(self, im):
            self._im = im

        def __call__(self, text):
            return self._im(text)

    def mem_with(imagination):
        m = VoxelTokenMemory(
            cfg, env=None,
            perception=Perception.create(cfg, vit_cfg=VIT_CFG,
                                         vit_params=params),
            imagination=imagination)
        m.state = state
        return m

    mem_f = mem_with(im_fused)
    mem_p = mem_with(PlainImagination(im_plain))

    best_f, top_f, sims_f = mem_f.voxel_localized("a potted plant", K=8)
    assert mem_f._text_query_step is not None          # fused path taken
    assert mem_f.last_imagined is not None
    best_p, top_p, sims_p = mem_p.voxel_localized("a potted plant", K=8)
    assert mem_p._text_query_step is None              # two-stage taken

    np.testing.assert_allclose(sims_f, sims_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(best_f, best_p)

    # region + floor masks flow through the fused step's kwargs
    mem_f.load_single_floor = True
    mem_f.floor_min_height, mem_f.floor_max_height = 0, 1 << 30
    best_r, top_r, sims_r = mem_f.voxel_localized(
        "a potted plant", K=8, region_radius=2.0,
        curr_grid=np.asarray(top_f[0]))
    assert len(sims_r) <= len(sims_f)
    if len(top_r):
        d = np.abs(np.asarray(top_r)[:, :2]
                   - np.asarray(top_f[0])[:2]).max(axis=1)
        assert (d * cfg.memory.cell_size <= 2.0 + 1e-6).all()


def test_async_prefetch_matches_blocking(built_store):
    """voxel_localized_async (the agent's stage-2 prefetch,
    robot._prefetch_working_memory) dispatches without materializing and
    its thunk returns exactly what the blocking call returns."""
    cfg, state, params = built_store
    factory = _make_imagination(seed_base=20)
    im_a, im_b = factory.new(), factory.new()

    def mem_with(imagination):
        m = VoxelTokenMemory(
            cfg, env=None,
            perception=Perception.create(cfg, vit_cfg=VIT_CFG,
                                         vit_params=params),
            imagination=imagination)
        m.state = state
        return m

    mem_a, mem_b = mem_with(im_a), mem_with(im_b)
    thunk = mem_a.voxel_localized_async("a potted plant", K=8)
    assert thunk is not None          # fused path eligible -> dispatched
    best_b, top_b, sims_b = mem_b.voxel_localized("a potted plant", K=8)
    best_a, top_a, sims_a = thunk()   # sync after other host work
    np.testing.assert_allclose(sims_a, sims_b, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(best_a, best_b)
    assert mem_a.last_imagined is not None

    # ineligible prompts (image arrays) fall back to None -> the agent
    # uses the blocking two-stage path
    img = np.zeros((8, 8, 3), np.uint8)
    assert mem_a.voxel_localized_async(img) is None
