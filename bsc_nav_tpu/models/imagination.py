"""Text -> query-image "imagination" pipeline.

Composes the framework's diffusion stack into the `imagine(text) ->
uint8 images` protocol the spatial memory consumes (reference
`imaginary`, memory_2.py:258-276: 3 images, 512^2, 28 steps, cfg 7.0).

Conditioning matches the real SD3.5-medium pipeline the reference loads
(memory_2.py:542-560, diffusers StableDiffusion3Pipeline.encode_prompt):

  pooled  = concat(CLIP-L pooled 768, CLIP-G pooled 1280)      -> 2048
  context = concat(CLIP-L hidden[-2], CLIP-G hidden[-2])        -> 2048
            zero-padded to the 4096 joint width, then the T5-XXL
            sequence features appended along the sequence axis
            (77 CLIP tokens + 256 T5 tokens).

Everything under one jit; bf16 compute.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bsc_nav_tpu.models import clip as C
from bsc_nav_tpu.models import mmdit as M
from bsc_nav_tpu.models import tokenizer as T
from bsc_nav_tpu.models import vae as V


@dataclasses.dataclass
class DiffusionImagination:
    """Callable matching the VoxelTokenMemory imagination protocol."""

    mmdit_params: dict
    mmdit_cfg: M.MMDiTConfig
    vae_params: dict
    vae_cfg: V.VAEConfig
    # the two CLIP text towers (text-only param dicts:
    # clip.init_text_params / clip.convert_clip_text_hf layouts)
    clip_l_params: dict
    clip_l_cfg: C.CLIPConfig
    clip_g_params: dict
    clip_g_cfg: C.CLIPConfig
    tokenizer: object
    # SD3.5 ships two CLIPTokenizers differing only in the pad token
    # (L pads with <|endoftext|>, G pads with "!" = id 0); one BPE
    # instance serves both with per-tower pad ids below.
    tokenizer_g: Optional[object] = None
    num_images: int = 3
    num_steps: int = 28
    guidance_scale: float = 7.0
    seed: int = 0
    # optional T5 conditioning (SD3.5 appends T5-XXL sequence features
    # after the CLIP context; reference loads the full pipeline at
    # memory_2.py:542-560).  None mimics diffusers' text_encoder_3=None
    # drop: a zero block of the CLIP context length is appended instead.
    t5_params: Optional[dict] = None
    t5_cfg: Optional[object] = None
    t5_tokenizer: Optional[object] = None
    # diffusers max_sequence_length: the reference's imaginary() passes
    # 512 explicitly (memory_2.py:263-270), overriding the diffusers 256
    # default; lower trades conditioning detail for MMDiT seq len
    t5_seq_len: int = 512
    # int8 W8A8 serving of the MMDiT token matmuls (ops/quant.py) -- the
    # TPU-native counterpart of the reference's NF4-quantized SD3.5
    # (memory_2.py:542-560).  Measured on TPU: full forward 116.8 ->
    # 101.1 ms/b6 (tools/mmdit_profile.py), sampler drift ~5% rel.
    quantize: bool = False

    def __post_init__(self):
        if self.quantize:
            self.mmdit_params = M.quantize_params(self.mmdit_params)
        if self.tokenizer_g is None:
            self.tokenizer_g = self.tokenizer
        lcfg, gcfg, mcfg = self.clip_l_cfg, self.clip_g_cfg, self.mmdit_cfg
        assert lcfg.embed_dim + gcfg.embed_dim == mcfg.pooled_dim, (
            "pooled concat width must equal the MMDiT pooled_dim "
            f"({lcfg.embed_dim}+{gcfg.embed_dim} != {mcfg.pooled_dim})")
        assert lcfg.text_width + gcfg.text_width <= mcfg.context_dim
        assert lcfg.context_length == gcfg.context_length
        use_t5 = self.t5_params is not None

        def full_context(text_params, t5_params, ids, t5_ids):
            # ids: [2, B, context_length] — row 0 tokenized for the L
            # tower (eot-padded), row 1 for G (zero-padded)
            hl, pl = C.encode_text_sd3(text_params["l"], ids[0], lcfg)
            hg, pg = C.encode_text_sd3(text_params["g"], ids[1], gcfg)
            pooled = jnp.concatenate([pl, pg], axis=-1)
            clip_ctx = jnp.concatenate([hl, hg], axis=-1)
            pad = mcfg.context_dim - clip_ctx.shape[-1]
            clip_ctx = jnp.pad(clip_ctx, [(0, 0), (0, 0), (0, pad)])
            if use_t5:
                from bsc_nav_tpu.models import t5 as T5
                t5_ctx = T5.encode(t5_params, t5_ids, self.t5_cfg)
            else:
                # diffusers zero-block when T5 is dropped (length =
                # tokenizer_max_length, width = joint dim)
                t5_ctx = jnp.zeros(clip_ctx.shape, clip_ctx.dtype)
            ctx = jnp.concatenate(
                [clip_ctx, t5_ctx.astype(clip_ctx.dtype)], axis=1)
            return ctx, pooled

        # params flow through as jit ARGUMENTS -- closing over them would
        # bake ~5 GB of weights into the executable as constants (slow
        # lowering, doubled HBM while compiling)
        def run(mmdit_params, vae_params, text_params, t5_params,
                ids, ids_uncond, t5_ids, t5_ids_uncond, key):
            ctx, pool = full_context(text_params, t5_params, ids, t5_ids)
            ctx_u, pool_u = full_context(text_params, t5_params,
                                         ids_uncond, t5_ids_uncond)
            n = self.num_images
            rep = lambda a: jnp.repeat(a, n, axis=0)
            lat = M.sample(
                mmdit_params, key, rep(ctx), rep(pool), mcfg,
                num_steps=self.num_steps,
                guidance_scale=self.guidance_scale,
                context_uncond=rep(ctx_u), pooled_uncond=rep(pool_u))
            img = V.decode(vae_params, lat, self.vae_cfg)
            return V.to_uint8(img)

        # exposed for parity tests against the diffusers-layout oracle
        self.encode_conditioning = full_context
        # unjitted core, composable into larger fused programs
        # (memory.pipeline.make_text_query_step traces it together with
        # the DINOv2 encode + store localize: no decoded-image round
        # trip through the host between imagination and query)
        self.imagine_core = run
        self._run = jax.jit(run)
        self._key = jax.random.PRNGKey(self.seed)

    @property
    def text_params(self):
        """The CLIP-tower pytree `imagine_core` consumes as its
        text_params argument."""
        return {"l": self.clip_l_params, "g": self.clip_g_params}

    def prep_inputs(self, text: str):
        """Host-side tokenization for one prompt: the argument tuple
        `imagine_core` / the fused text-query step consume after the
        param pytrees (ids, ids_uncond, t5_ids, t5_ids_uncond).
        ids are stacked [2, B, L]: row 0 for the L tower (pads with
        <|endoftext|>, diffusers CLIPTokenizer), row 1 for G (pads 0)."""
        def stack(t):
            l = T.tokenize([t], self.tokenizer, pad_id=self.tokenizer.eot)
            g = T.tokenize([t], self.tokenizer_g)
            return jnp.asarray(np.stack([l, g]))
        return (stack(text), stack(""),
                self._t5_ids(text), self._t5_ids(""))

    def next_key(self):
        """Split and return a fresh sampling key (same stream as
        __call__ uses, so fused-path and two-stage calls interleave
        deterministically)."""
        self._key, sub = jax.random.split(self._key)
        return sub

    def _t5_ids(self, text: str):
        if self.t5_params is None:
            return jnp.zeros((1, 1), jnp.int32)    # unused placeholder
        ids = self.t5_tokenizer.encode(text)
        L = self.t5_seq_len
        # HF T5 truncation keeps </s> as the LAST token when the prompt
        # fills the window; pad with 0 otherwise
        ids = (ids[:L - 1] + [1] + [0] * L)[:L]
        return jnp.asarray([ids], jnp.int32)

    def __call__(self, text: str) -> np.ndarray:
        return np.asarray(self._run(
            self.mmdit_params, self.vae_params, self.text_params,
            self.t5_params, *self.prep_inputs(text), self.next_key()))
