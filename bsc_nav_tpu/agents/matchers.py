"""View scoring and label matching (the CLIP roles in the agent loop).

The reference uses MetaCLIP ViT-H/14 for (a) scoring 360-degree scan
views against the goal prompt/image in check_around (reference
objnav_benchmark.py:703-729) and (b) matching the goal text against
long-term memory labels (:539-557).  Both are small pluggable
interfaces here, with CLIP-backed implementations and deterministic
test doubles.
"""

from __future__ import annotations

from typing import List, Optional, Protocol, Sequence, Union

import numpy as np


class ViewScorer(Protocol):
    def score(self, views: Sequence[np.ndarray],
              prompt) -> np.ndarray: ...


class LabelMatcher(Protocol):
    def best(self, text: str, labels: Sequence[str]) -> int: ...


class CLIPMatcher:
    """CLIP-backed scorer + matcher over converted checkpoints."""

    def __init__(self, clip_params, clip_cfg, tokenizer, quantize=False):
        import jax
        import jax.numpy as jnp
        from bsc_nav_tpu.models import clip as C
        from bsc_nav_tpu.models import tokenizer as T

        if quantize:
            # int8 W8A8 on the tower token matmuls (clip.quantize_params);
            # view scores are softmaxed similarities, robust to the ~1e-2
            # feature drift (tests/test_quant.py::test_clip_quantized)
            clip_params = C.quantize_params(clip_params)
        self.params, self.cfg, self.tok = clip_params, clip_cfg, tokenizer
        self._C, self._T = C, T

        # params flow through as jit ARGUMENTS -- closing over the
        # multi-GB CLIP tower would bake it into the lowered program as
        # constants and kill the tunneled remote compile (CLAUDE.md;
        # same rule as models/imagination.py)
        self._enc_img = jax.jit(
            lambda p, imgs: C.encode_image(
                p, C.preprocess(imgs, clip_cfg), clip_cfg))
        self._enc_txt = jax.jit(
            lambda p, ids: C.encode_text(p, ids, clip_cfg))
        # prompt/label embeddings are reused across every check_around
        # scan and long-term retrieval in an episode; caching them cuts
        # the agent loop to ONE device dispatch per scan (the view
        # embed) instead of text+view (each dispatch ~1 ms + a ~30 ms
        # value sync through the tunnel, CLAUDE.md)
        self._text_cache = {}

    def _embed_text(self, texts: Sequence[str]) -> np.ndarray:
        import jax.numpy as jnp
        missing = [t for t in texts if t not in self._text_cache]
        if missing:
            if len(self._text_cache) > 4096:
                self._text_cache.clear()
            ids = self._T.tokenize(missing, self.tok)
            feats = np.asarray(self._enc_txt(self.params, jnp.asarray(ids)))
            for t, f in zip(missing, feats):
                self._text_cache[t] = f
        return np.stack([self._text_cache[t] for t in texts])

    def _embed_views(self, views) -> np.ndarray:
        import jax.numpy as jnp
        arr = np.stack([np.asarray(v)[:, :, :3] for v in views]).astype(np.uint8)
        return np.asarray(self._enc_img(self.params, jnp.asarray(arr)))

    def score(self, views, prompt) -> np.ndarray:
        """Softmax similarity of each view to the prompt
        (objnav_benchmark.py:714-715)."""
        img_f = self._embed_views(views)
        if isinstance(prompt, str):
            q = self._embed_text([prompt])[0]
        else:
            q = self._embed_views([prompt])[0]
        sims = img_f @ q
        e = np.exp(sims - sims.max())
        return e / e.sum()

    def best(self, text: str, labels: Sequence[str]) -> int:
        tf = self._embed_text([text])[0]
        lf = self._embed_text(list(labels))
        return int(np.argmax(lf @ tf))


class ColorViewScorer:
    """Test double: scores a view by the fraction of pixels close to the
    prototype color of the prompt's object (fake box world)."""

    def __init__(self, prototypes: dict, tol: float = 40.0):
        self.prototypes = {k: np.asarray(v, float)
                           for k, v in prototypes.items()}
        self.tol = tol

    def _frac(self, view: np.ndarray, proto: np.ndarray) -> float:
        img = np.asarray(view)[:, :, :3].astype(float)
        d = np.linalg.norm(img - proto[None, None], axis=-1)
        return float((d < self.tol).mean())

    def _proto_for(self, prompt) -> Optional[np.ndarray]:
        if not isinstance(prompt, str):
            # image prompt: dominant non-gray color
            img = np.asarray(prompt)[:, :, :3].astype(float)
            best, bestf = None, 0.0
            for proto in self.prototypes.values():
                f = self._frac(img, proto)
                if f > bestf:
                    best, bestf = proto, f
            return best
        for label, proto in self.prototypes.items():
            if label in prompt:
                return proto
        return None

    def score(self, views, prompt) -> np.ndarray:
        proto = self._proto_for(prompt)
        if proto is None:
            return np.full(len(views), 1.0 / len(views))
        f = np.array([self._frac(v, proto) for v in views])
        e = np.exp(f * 20.0 - (f * 20.0).max())
        return e / e.sum()

    def best(self, text: str, labels: Sequence[str]) -> int:
        for i, lbl in enumerate(labels):
            if lbl in text or text in lbl:
                return i
        return 0
