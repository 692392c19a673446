"""Open-vocabulary detection demo (the reference's gdino.py role,
gdino.py:44-68: prompt-driven zero-shot detection on one image with an
annotated visualization), served by THIS framework's detectors instead
of a torch GroundingDINO:

  python demo_detect.py --classes "oven. tv. bookcase" \\
      --image frame.png --out annotated.png \\
      [--weights-dir converted/]   # YOLO-World + CLIP text embeddings

Without --weights-dir (offline) it detects the fake world's color
prototypes on a rendered frame, so the demo runs anywhere.  Output is a
headless annotated PNG (reference pops a matplotlib window)."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def annotate(img: np.ndarray, detections) -> np.ndarray:
    """Draw boxes + labels (PIL, headless)."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(np.asarray(img)[:, :, :3].astype(np.uint8))
    draw = ImageDraw.Draw(im)
    for det in detections:
        x1, y1, x2, y2 = det.xyxy
        draw.rectangle(((x1, y1), (x2, y2)), outline=(255, 40, 40),
                       width=2)
        text = f"{det.label}: {det.confidence:.2f}"
        tb = draw.textbbox((x1, max(0, y1 - 12)), text)
        draw.rectangle(tb, fill=(255, 40, 40))
        draw.text((x1, max(0, y1 - 12)), text, fill=(255, 255, 255))
    return np.asarray(im)


def build_detector(args, classes):
    if args.detector == "grounding-dino":
        import jax.numpy as jnp
        from bsc_nav_tpu.models import grounding_dino as G
        from bsc_nav_tpu.models.weights import unflatten_params
        from bsc_nav_tpu.models.wordpiece import WordPieceTokenizer

        if not args.weights_dir:
            raise SystemExit("--detector grounding-dino needs "
                             "--weights-dir with grounding_dino_tiny.npz "
                             "and bert vocab.txt")
        z = np.load(os.path.join(args.weights_dir,
                                 "grounding_dino_tiny.npz"))
        params = unflatten_params({k: jnp.asarray(v) for k, v in
                                   z.items()})
        tok = WordPieceTokenizer.from_vocab_file(
            os.path.join(args.weights_dir, "vocab.txt"))
        return G.GroundingDinoDetector(
            params, G.GROUNDING_DINO_TINY, classes, tokenizer=tok,
            confidence=args.confidence)
    if args.weights_dir:
        import jax.numpy as jnp
        from bsc_nav_tpu.models import clip as C
        from bsc_nav_tpu.models import tokenizer as T
        from bsc_nav_tpu.models import yolo_world as Y
        from bsc_nav_tpu.models.weights import unflatten_params

        z = np.load(os.path.join(args.weights_dir, "yolov8x_worldv2.npz"))
        yparams = unflatten_params({k: jnp.asarray(v) for k, v in
                                    z.items()})
        cz = np.load(os.path.join(args.weights_dir,
                                  "metaclip_vith14.npz"))
        cparams = unflatten_params({k: jnp.asarray(v) for k, v in
                                    cz.items()})
        ccfg = C.METACLIP_VITH14
        tok = T.default_tokenizer(os.path.join(
            args.weights_dir, "bpe_simple_vocab_16e6.txt.gz"))
        ids = T.tokenize([f"a photo of a {c}" for c in classes], tok)
        emb = np.asarray(C.encode_text(cparams, jnp.asarray(ids), ccfg))
        return Y.YoloWorldDetector(yparams, Y.YOLOV8X_WORLDV2, classes,
                                   emb, confidence=args.confidence)
    from benchmarks.setup import FAKE_PROTOTYPES
    from bsc_nav_tpu.models.detector import ColorPrototypeDetector
    return ColorPrototypeDetector(FAKE_PROTOTYPES,
                                  confidence=args.confidence)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None,
                   help="input image (default: render a fake-env frame)")
    p.add_argument("--classes", default="bed. plant. sofa",
                   help="'. '-separated open-vocab class prompt")
    p.add_argument("--out", default="annotated.png")
    p.add_argument("--confidence", type=float, default=0.3)
    p.add_argument("--weights-dir", default=None)
    p.add_argument("--detector", default="yolo-world",
                   choices=["yolo-world", "grounding-dino"],
                   help="open-vocab detector backend (reference "
                        "gdino.py:44-68 demo role)")
    args = p.parse_args(argv)

    classes = [c.strip().rstrip(".") for c in args.classes.split(".")
               if c.strip()]

    if args.image:
        from PIL import Image
        img = np.asarray(Image.open(args.image).convert("RGB"))
    else:
        from bsc_nav_tpu.config import Config, SensorConfig
        from bsc_nav_tpu.env.fake import BoxScene, FakeNavEnv
        env = FakeNavEnv(Config(sensor=SensorConfig(width=256,
                                                    height=256)),
                         scene=BoxScene.default(), seed=3)
        img = env._observe()["rgb"]

    det = build_detector(args, classes)
    dets = det.detect(np.asarray(img))
    for d in dets:
        print(f"{d.label:>12}  conf={d.confidence:.3f}  "
              f"box=({d.xyxy[0]:.0f},{d.xyxy[1]:.0f},"
              f"{d.xyxy[2]:.0f},{d.xyxy[3]:.0f})")
    out = annotate(img, dets)
    from PIL import Image
    Image.fromarray(out).save(args.out)
    print(f"wrote {args.out} ({len(dets)} detections)")
    return dets


if __name__ == "__main__":
    main()
