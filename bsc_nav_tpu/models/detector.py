"""Open-vocabulary detection feeding the long-term memory.

The reference uses YOLO-World with 21 HM3D classes at conf 0.55
(reference memory_2.py:49-50, :905-945; args.py:72-73).  The detector is
a pluggable interface here (SURVEY notes the encoder/detector must be
pluggable):

  - ClipPatchDetector: MaskCLIP-style dense zero-shot detection from the
    CLIP image tower: the last block's value-projection tokens are pushed
    through ln_post+proj to become patch embeddings comparable with class
    text embeddings; thresholded heat-maps -> connected components ->
    boxes.  Works with converted MetaCLIP checkpoints; no extra weights.
  - ColorPrototypeDetector: appearance-prototype matcher for the fake
    box-world env (tests / offline CI).

Detections are (label, confidence, xyxy) -- the exact surface the
long-term memory consumes (memory_2.py:915-925).
"""

from __future__ import annotations

import dataclasses
from typing import List, Protocol, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class Detection:
    label: str
    confidence: float
    xyxy: Tuple[float, float, float, float]


class Detector(Protocol):
    def detect(self, rgb: np.ndarray) -> List[Detection]: ...


def _boxes_from_heatmap(heat: np.ndarray, labels_idx: np.ndarray,
                        classes: Sequence[str], conf: float, scale_y: float,
                        scale_x: float) -> List[Detection]:
    """Connected components over a thresholded per-patch heatmap."""
    from scipy import ndimage

    out: List[Detection] = []
    for ci, cname in enumerate(classes):
        mask = (labels_idx == ci) & (heat >= conf)
        if not mask.any():
            continue
        lab, n = ndimage.label(mask)
        for comp in range(1, n + 1):
            ys, xs = np.nonzero(lab == comp)
            score = float(heat[lab == comp].max())
            out.append(Detection(
                cname, score,
                (float(xs.min() * scale_x), float(ys.min() * scale_y),
                 float((xs.max() + 1) * scale_x),
                 float((ys.max() + 1) * scale_y))))
    return out


class ClipPatchDetector:
    """MaskCLIP-style dense zero-shot detector over the CLIP image tower.

    Patch embedding extraction: run the vision tower but replace the last
    block's attention with its value path only (v projection + out_proj),
    then ln_post + proj per PATCH token; compare with normalized class
    text embeddings.
    """

    def __init__(self, clip_params, clip_cfg, tokenizer,
                 classes: Sequence[str], confidence: float = 0.55):
        import jax
        import jax.numpy as jnp
        from bsc_nav_tpu.models import clip as C
        from bsc_nav_tpu.models import tokenizer as T
        from bsc_nav_tpu.models.vit import layer_norm, _linear, patchify

        self.classes = list(classes)
        self.confidence = confidence
        self.cfg = clip_cfg
        self.params = clip_params

        ids = T.tokenize([f"a photo of a {c}" for c in classes], tokenizer)
        self.text_emb = np.asarray(
            C.encode_text(clip_params, jnp.asarray(ids), clip_cfg))

        cfg = clip_cfg

        # params flow through as jit ARGUMENTS -- closing over the
        # multi-GB CLIP tower bakes it into the program as constants
        # (CLAUDE.md remote-compile rule)
        @jax.jit
        def dense_embed(params, images_uint8):
            x = C.preprocess(images_uint8, cfg)
            v = params["visual"]
            h = _linear(patchify(x, cfg.patch_size), v["patch_embed"])
            B = h.shape[0]
            cls = jnp.broadcast_to(
                v["class_embedding"][None, None, :],
                (B, 1, cfg.vision_width)).astype(h.dtype)
            h = jnp.concatenate([cls, h], axis=1) + v["pos_embed"][None]
            h = layer_norm(h, v["ln_pre"], cfg.ln_eps)
            from bsc_nav_tpu.models.clip import _tower_forward
            h = _tower_forward(h, v["blocks"][:-1], cfg.vision_heads,
                               cfg.ln_eps)
            # value-only path of the last block (MaskCLIP trick)
            blk = v["blocks"][-1]
            y = layer_norm(h, blk["ln1"], cfg.ln_eps)
            qkv = _linear(y, blk["qkv"])
            val = qkv[..., 2 * cfg.vision_width:]
            val = _linear(val, blk["proj"]) + h
            val = layer_norm(val, v["ln_post"], cfg.ln_eps)
            emb = jnp.einsum("bsd,de->bse", val, v["proj"],
                             preferred_element_type=jnp.float32)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            return emb[:, 1:]        # patch tokens only

        self._dense = dense_embed

    def detect(self, rgb: np.ndarray) -> List[Detection]:
        return self.detect_batch(rgb[None])[0]

    def detect_batch(self, rgbs: np.ndarray) -> List[List[Detection]]:
        """Batched detection (ONE device call for a whole frame batch --
        per-frame dispatch costs a full host<->device round trip)."""
        import jax.numpy as jnp

        B, H, W = rgbs.shape[:3]
        embs = np.asarray(self._dense(self.params,
                                      jnp.asarray(rgbs[:, :, :, :3])))
        g = self.cfg.grid
        out: List[List[Detection]] = []
        for b in range(B):
            sims = embs[b] @ self.text_emb.T             # [T, C]
            p = np.exp(sims * 100.0 - sims.max(axis=1, keepdims=True) * 100.0)
            p /= p.sum(axis=1, keepdims=True)
            heat = p.max(axis=1).reshape(g, g)
            labels_idx = p.argmax(axis=1).reshape(g, g)
            out.append(_boxes_from_heatmap(
                heat, labels_idx, self.classes, self.confidence,
                scale_y=H / g, scale_x=W / g))
        return out


class ColorPrototypeDetector:
    """Test-double detector for the fake box world: per-class RGB
    prototypes matched within tolerance, component boxes with confidence
    proportional to color closeness."""

    def __init__(self, prototypes: dict, confidence: float = 0.55,
                 tol: float = 40.0):
        self.prototypes = {k: np.asarray(v, float)
                           for k, v in prototypes.items()}
        self.confidence = confidence
        self.tol = tol

    def detect(self, rgb: np.ndarray) -> List[Detection]:
        from scipy import ndimage

        img = rgb[:, :, :3].astype(float)
        out: List[Detection] = []
        for label, proto in self.prototypes.items():
            d = np.linalg.norm(img - proto[None, None], axis=-1)
            mask = d < self.tol
            if mask.sum() < 12:
                continue
            lab, n = ndimage.label(mask)
            for comp in range(1, n + 1):
                sel = lab == comp
                if sel.sum() < 12:
                    continue
                ys, xs = np.nonzero(sel)
                conf = float(1.0 - d[sel].mean() / 255.0)
                if conf < self.confidence:
                    continue
                out.append(Detection(
                    label, conf,
                    (float(xs.min()), float(ys.min()),
                     float(xs.max() + 1), float(ys.max() + 1))))
        return out
