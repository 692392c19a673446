"""Converter audits at REAL model dimensions (VERDICT r2 item 8).

The tiny-config forward-parity tests prove the math; these prove the
key mapping and every tensor SHAPE at the production dimensions the
real checkpoints ship (yolov8x-worldv2; SD3.5-medium audited in
test_mmdit.py once dual attention landed) -- no forward pass needed,
so full-size fabricated state dicts are cheap (zero-filled).
"""

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")


def shape_tree(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


def test_convert_ultralytics_v8x_key_and_shape_coverage():
    """yolov8x-worldv2 at FULL width/depth: the torch oracle (built from
    the published yolov8x-worldv2.yaml scaling: width 1.25, depth 1.0,
    max_channels 512, C2fAttn ec/nh ladder) converts with strict key
    coverage, and every converted tensor's shape matches init_params at
    the same config -- the layout risk the tiny-config tests can't see
    (e.g. width-scaled channel rounding, per-level head channels)."""
    import torch_yolo_oracle as O
    from bsc_nav_tpu.models import yolo_world as Y

    cfg = Y.YOLOV8X_WORLDV2
    with torch.no_grad():
        oracle = O.YoloWorldOracle(
            w=cfg.ch, n=cfg.n,
            ecs=[cfg.ch(256), cfg.ch(128), cfg.ch(256), cfg.ch(512)],
            nhs=[8, 4, 8, 16],
            embed_dim=cfg.embed_dim, gc=cfg.embed_dim,
            reg_max=cfg.reg_max)
    oracle.eval()

    params = Y.convert_ultralytics(oracle.state_dict(), cfg, strict=True)

    expected = jax.eval_shape(
        lambda k: Y.init_params(cfg, k, text_dim=cfg.embed_dim),
        jax.random.PRNGKey(0))
    flat_got = jax.tree_util.tree_leaves_with_path(params)
    flat_want = {p: tuple(l.shape) for p, l in
                 jax.tree_util.tree_leaves_with_path(expected)}
    assert len(flat_got) == len(flat_want)
    for path, leaf in flat_got:
        assert path in flat_want, f"unexpected param {path}"
        assert tuple(leaf.shape) == flat_want[path], (
            f"shape mismatch at {jax.tree_util.keystr(path)}: "
            f"converted {tuple(leaf.shape)} vs init {flat_want[path]}")
    # sanity: this really is the x-scale model, not a shrunk one
    n_params = sum(int(np.prod(l.shape)) for _, l in flat_got)
    assert n_params > 60e6, f"v8x should be >60M params, got {n_params/1e6:.1f}M"


def test_verify_all_manifest_fabricated_dry_run():
    """The unattended whole-zoo gate (tools/convert_weights.py
    verify-all) dry-runs green offline: every manifest entry fabricates
    a full-size state dict, converts it at real checkpoint dimensions,
    and matches the recorded leaf/param expectations.  The first machine
    with network + downloaded weights runs the same command without
    --fabricate to convert and gate the real zoo (VERDICT r3 item 8)."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "convert_weights.py"),
         "verify-all", "--fabricate"],
        capture_output=True, text=True, timeout=900, env=env, cwd=root)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "verify-all OK (10 models" in proc.stdout
