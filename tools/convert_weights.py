"""Convert public torch checkpoints into this framework's .npz params.

One-off host-side tool (torch CPU only).  No weights ship with this
repo; point it at files you have downloaded:

  # DINOv2 ViT-L/14 with registers (torch hub .pth state dict)
  python tools/convert_weights.py dinov2 \
      --checkpoint dinov2_vitl14_reg4_pretrain.pth \
      --arch dinov2_vitl14_reg --out weights/dinov2_vitl14_reg.npz

  # MetaCLIP / open_clip ViT-H-14 (open_clip .pt / .bin state dict)
  python tools/convert_weights.py clip \
      --checkpoint metaclip_h14_fullcc2.5b.pt --out weights/metaclip_vith14.npz

  # verify a converted DINOv2 against the torch model (needs torch hub)
  python tools/convert_weights.py verify-dinov2 \
      --npz weights/dinov2_vitl14_reg.npz --arch dinov2_vitl14_reg
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_torch_state_dict(path: str):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    # open_clip checkpoints may carry a 'module.' prefix
    return { (k[7:] if k.startswith("module.") else k): v
             for k, v in obj.items() }


def convert_dinov2_cmd(args):
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.models.weights import (convert_dinov2,
                                            convert_dinov2_hf,
                                            save_params_npz)

    cfg = vit.CONFIGS[args.arch]
    sd = _load_torch_state_dict(args.checkpoint)
    # auto-detect layout: torch hub (facebookresearch/dinov2) vs
    # HuggingFace transformers (facebook/dinov2-with-registers-*)
    if any(k.startswith("embeddings.") for k in sd):
        params = convert_dinov2_hf(sd, cfg)
    else:
        params = convert_dinov2(sd, cfg)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_npz(params, args.out)
    print(f"wrote {args.out}")


def convert_clip_cmd(args):
    from bsc_nav_tpu.models import clip as C
    from bsc_nav_tpu.models.weights import save_params_npz

    cfg = C.CONFIGS[args.arch]
    sd = _load_torch_state_dict(args.checkpoint)
    # auto-detect layout: open_clip vs HuggingFace CLIPModel
    # (facebook/metaclip-h14-fullcc2.5b ships in the latter)
    if any(k.startswith("vision_model.") for k in sd):
        params = C.convert_clip_hf(sd, cfg)
    else:
        params = C.convert_openclip(sd, cfg)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_npz(params, args.out)
    print(f"wrote {args.out}")


def _load_maybe_safetensors(path: str):
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file
            return load_file(path)
        except ImportError as e:
            raise ImportError("safetensors not installed; convert the "
                              "checkpoint to a torch .bin first") from e
    return _load_torch_state_dict(path)


def convert_sd3_cmd(args):
    from bsc_nav_tpu.models import mmdit as M
    from bsc_nav_tpu.models.weights import save_params_npz

    sd = _load_maybe_safetensors(args.checkpoint)
    params = M.convert_sd3(sd, M.SD35_MEDIUM)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_npz(params, args.out)
    print(f"wrote {args.out}")


def convert_t5_cmd(args):
    from bsc_nav_tpu.models import t5 as T5
    from bsc_nav_tpu.models.weights import save_params_npz

    sd = _load_maybe_safetensors(args.checkpoint)
    params = T5.convert_t5(sd, T5.T5_XXL)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_npz(params, args.out)
    print(f"wrote {args.out}")


def convert_yolo_cmd(args):
    from bsc_nav_tpu.models import yolo_world as Y
    from bsc_nav_tpu.models.weights import save_params_npz

    sd = _load_torch_state_dict(args.checkpoint)
    params = Y.convert_ultralytics(sd, Y.YOLOV8X_WORLDV2)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_npz(params, args.out)
    print(f"wrote {args.out}")


def convert_vae_cmd(args):
    from bsc_nav_tpu.models import vae as VAE
    from bsc_nav_tpu.models.weights import save_params_npz

    sd = _load_maybe_safetensors(args.checkpoint)
    params = VAE.convert_vae_decoder(sd, VAE.SD3_VAE)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_npz(params, args.out)
    print(f"wrote {args.out}")


def convert_gdino_cmd(args):
    from bsc_nav_tpu.models import grounding_dino as G
    from bsc_nav_tpu.models.weights import save_params_npz

    sd = _load_maybe_safetensors(args.checkpoint)
    params = G.convert_hf(sd, G.GROUNDING_DINO_TINY)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_npz(params, args.out)
    print(f"wrote {args.out}")


def convert_qwen_vl_cmd(args):
    """HF Qwen2.5-VL checkpoint dir -> qwen_vl.npz (+ the dir keeps its
    tokenizer files for agents/local_vlm.load_local_vlm)."""
    from bsc_nav_tpu.models import qwen_vl as Q
    from bsc_nav_tpu.models.weights import save_params_npz

    import glob as _glob
    sd = {}
    shards = sorted(_glob.glob(os.path.join(args.checkpoint,
                                            "*.safetensors")))
    if shards:
        from safetensors import safe_open
        for sh in shards:
            with safe_open(sh, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
    else:
        sd = _load_torch_state_dict(args.checkpoint)
    params = Q.convert_hf(sd, Q.QWEN25_VL_3B)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_npz(params, args.out)
    print(f"wrote {args.out}")


def verify_dinov2_cmd(args):
    """Compare JAX vs torch-hub DINOv2 on random images (requires
    network access for torch.hub unless the hub cache is primed)."""
    import jax.numpy as jnp
    import torch
    from bsc_nav_tpu.models import vit
    from bsc_nav_tpu.models.weights import load_dinov2_npz

    cfg = vit.CONFIGS[args.arch]
    params = load_dinov2_npz(args.npz, cfg)
    tmodel = torch.hub.load("facebookresearch/dinov2", args.arch).eval()

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel.forward_features(
            torch.from_numpy(img.transpose(0, 3, 1, 2)))
    j_out = vit.forward_features(params, jnp.asarray(img), cfg)
    err = np.abs(np.asarray(j_out["x_norm_patchtokens"])
                 - t_out["x_norm_patchtokens"].numpy()).max()
    print(f"max abs err (patch tokens): {err:.2e}")
    assert err < 5e-3, "conversion mismatch"
    print("OK")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dinov2")
    d.add_argument("--checkpoint", required=True)
    d.add_argument("--arch", default="dinov2_vitl14_reg")
    d.add_argument("--out", required=True)
    d.set_defaults(fn=convert_dinov2_cmd)

    c = sub.add_parser("clip")
    c.add_argument("--checkpoint", required=True)
    c.add_argument("--arch", default="metaclip_vith14")
    c.add_argument("--out", required=True)
    c.set_defaults(fn=convert_clip_cmd)

    s3 = sub.add_parser("sd3")
    s3.add_argument("--checkpoint", required=True,
                    help="diffusers SD3Transformer2DModel .bin/.safetensors")
    s3.add_argument("--out", required=True)
    s3.set_defaults(fn=convert_sd3_cmd)

    t5p = sub.add_parser("t5")
    t5p.add_argument("--checkpoint", required=True)
    t5p.add_argument("--out", required=True)
    t5p.set_defaults(fn=convert_t5_cmd)

    yw = sub.add_parser("yolo-world")
    yw.add_argument("--checkpoint", required=True,
                    help="ultralytics yolov8x-worldv2.pt")
    yw.add_argument("--out", required=True)
    yw.set_defaults(fn=convert_yolo_cmd)

    qv = sub.add_parser("qwen-vl")
    qv.add_argument("--checkpoint", required=True,
                    help="HF Qwen2.5-VL-3B-Instruct dir (safetensors)")
    qv.add_argument("--out", required=True)
    qv.set_defaults(fn=convert_qwen_vl_cmd)

    va = sub.add_parser("sd3-vae")
    va.add_argument("--checkpoint", required=True,
                    help="diffusers AutoencoderKL .safetensors/.bin "
                         "(the SD3.5 vae/ subfolder)")
    va.add_argument("--out", required=True)
    va.set_defaults(fn=convert_vae_cmd)

    gd = sub.add_parser("grounding-dino")
    gd.add_argument("--checkpoint", required=True,
                    help="HF IDEA-Research/grounding-dino-tiny "
                         "pytorch_model.bin or .safetensors")
    gd.add_argument("--out", required=True)
    gd.set_defaults(fn=convert_gdino_cmd)

    v = sub.add_parser("verify-dinov2")
    v.add_argument("--npz", required=True)
    v.add_argument("--arch", default="dinov2_vitl14_reg")
    v.set_defaults(fn=verify_dinov2_cmd)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
