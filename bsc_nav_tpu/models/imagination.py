"""Text -> query-image "imagination" pipeline.

Composes the framework's diffusion stack into the `imagine(text) ->
uint8 images` protocol the spatial memory consumes (reference
`imaginary`, memory_2.py:258-276: 3 images, 512^2, 28 steps, cfg 7.0):

  text --CLIP text tower(s)--> (context tokens, pooled) --MMDiT-->
  latents --VAE decode--> images

The reference conditions SD3.5 with CLIP-L + CLIP-G + T5; this pipeline
is parameterized by whatever text encoders are supplied (our converted
CLIP towers; a T5 port can be slotted in without touching callers).
Everything under one jit; bf16 compute.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

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
    clip_params: dict
    clip_cfg: C.CLIPConfig
    tokenizer: object
    num_images: int = 3
    num_steps: int = 28
    guidance_scale: float = 7.0
    seed: int = 0
    # optional T5 conditioning (SD3.5 concatenates T5-XXL sequence
    # features after the CLIP context; reference loads T5-XXL at
    # memory_2.py:49): supply converted T5 params + its tokenizer to
    # enable; None keeps the CLIP-only context.
    t5_params: Optional[dict] = None
    t5_cfg: Optional[object] = None
    t5_tokenizer: Optional[object] = None
    # int8 W8A8 serving of the MMDiT token matmuls (ops/quant.py) -- the
    # TPU-native counterpart of the reference's NF4-quantized SD3.5
    # (memory_2.py:542-560).  Measured on TPU: full forward 116.8 ->
    # 101.1 ms/b6 (tools/mmdit_profile.py), sampler drift ~5% rel.
    quantize: bool = False

    def __post_init__(self):
        if self.quantize:
            self.mmdit_params = M.quantize_params(self.mmdit_params)
        ccfg, mcfg = self.clip_cfg, self.mmdit_cfg

        def encode_text(tparams, ids):
            # sequence features from the text tower (pre-pool), plus the
            # pooled embedding; projected/padded into the MMDiT context
            t = tparams
            x = t["token_embedding"][ids] + t["pos_embed"][None]
            x = C._tower_forward(x, t["blocks"], ccfg.text_heads,
                                 ccfg.ln_eps, causal=True)
            from bsc_nav_tpu.models.vit import layer_norm
            x = layer_norm(x, t["ln_final"], ccfg.ln_eps)
            eot = jnp.argmax(ids, axis=-1)
            pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
            # pad/truncate widths into the MMDiT conditioning dims
            ctx = _fit(x, mcfg.context_dim)
            pool = _fit(pooled, mcfg.pooled_dim)
            return ctx, pool

        def _fit(x, dim):
            d = x.shape[-1]
            if d == dim:
                return x
            if d > dim:
                return x[..., :dim]
            pad = [(0, 0)] * (x.ndim - 1) + [(0, dim - d)]
            return jnp.pad(x, pad)

        use_t5 = self.t5_params is not None

        def full_context(text_params, t5_params, ids, t5_ids):
            ctx, pool = encode_text(text_params, ids)
            if use_t5:
                # SD3.5 layout: CLIP context (zero-padded to the joint
                # width) followed by the T5 sequence features
                from bsc_nav_tpu.models import t5 as T5
                t5_ctx = T5.encode(t5_params, t5_ids, self.t5_cfg)
                ctx = jnp.concatenate(
                    [ctx, _fit(t5_ctx, mcfg.context_dim).astype(ctx.dtype)],
                    axis=1)
            return ctx, pool

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

        # unjitted core, composable into larger fused programs
        # (memory.pipeline.make_text_query_step traces it together with
        # the DINOv2 encode + store localize: no decoded-image round
        # trip through the host between imagination and query)
        self.imagine_core = run
        self._run = jax.jit(run)
        self._key = jax.random.PRNGKey(self.seed)

    def prep_inputs(self, text: str):
        """Host-side tokenization for one prompt: the argument tuple
        `imagine_core` / the fused text-query step consume after the
        param pytrees (ids, ids_uncond, t5_ids, t5_ids_uncond)."""
        ids = T.tokenize([text], self.tokenizer)
        ids_u = T.tokenize([""], self.tokenizer)
        return (jnp.asarray(ids), jnp.asarray(ids_u),
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
        L = 77
        # HF T5 truncation keeps </s> as the LAST token when the prompt
        # fills the window; pad with 0 otherwise
        ids = (ids[:L - 1] + [1] + [0] * L)[:L]
        return jnp.asarray([ids], jnp.int32)

    def __call__(self, text: str) -> np.ndarray:
        return np.asarray(self._run(
            self.mmdit_params, self.vae_params, self.clip_params["text"],
            self.t5_params, *self.prep_inputs(text), self.next_key()))
