"""YOLO-World architecture tests: component oracles + end-to-end shape
and protocol checks (tiny config, random weights)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bsc_nav_tpu.models import yolo_world as Y


CFG = Y.YOLO_TEST


def test_dfl_decode_matches_oracle(rng):
    reg_max = 16
    logits = rng.normal(size=(2, 3, 4 * reg_max)).astype(np.float32)
    out = np.asarray(Y.dfl_decode(jnp.asarray(logits), reg_max))
    x = logits.reshape(2, 3, 4, reg_max)
    e = np.exp(x - x.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    expected = (p * np.arange(reg_max)).sum(-1)
    np.testing.assert_allclose(out, expected, rtol=1e-5)
    assert (out >= 0).all() and (out <= reg_max - 1).all()


def test_iou_and_nms_oracle():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     float)
    scores = np.array([0.9, 0.8, 0.7])
    iou = Y.iou_xyxy(boxes, boxes)
    np.testing.assert_allclose(np.diag(iou), 1.0)
    # boxes 0/1 overlap heavily (IoU = 81/119 ~ 0.68), box 2 is disjoint
    assert abs(iou[0, 1] - 81.0 / 119.0) < 1e-6
    assert iou[0, 2] == 0.0
    keep = Y.nms(boxes, scores, iou_thr=0.5)
    assert keep == [0, 2]
    keep_loose = Y.nms(boxes, scores, iou_thr=0.7)
    assert keep_loose == [0, 1, 2]


def test_max_sigmoid_attention_gating(rng):
    """The gate must respond to text-image agreement: a guide aligned
    with the pixel embedding gates higher than an anti-aligned one."""
    B, H, W, C = 1, 4, 4, 16
    nh, ec = 2, 16
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 8))
    p = Y._maxsig_attn(ks, C, ec, gc=8, nh=nh, dtype=jnp.float32)
    # make guide-linear identity-ish: gl_w random; craft two guides
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    g_pos = jnp.asarray(rng.normal(size=(B, 3, 8)).astype(np.float32))
    out_pos = Y.max_sigmoid_attention(x, g_pos * 5.0, p)
    out_neg = Y.max_sigmoid_attention(x, -g_pos * 5.0, p)
    assert out_pos.shape == (B, H, W, C)
    assert not np.allclose(np.asarray(out_pos), np.asarray(out_neg))


def test_forward_shapes_and_decode():
    params = Y.init_params(CFG, jax.random.PRNGKey(0), text_dim=32)
    T = 5
    text = jnp.asarray(np.random.default_rng(0).normal(
        size=(T, 32)).astype(np.float32))
    B = 2   # multi-frame batch (guide must broadcast over the batch)
    img = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, size=(B, CFG.img_size, CFG.img_size, 3)).astype(np.float32))
    outs = Y.forward(params, img, text, CFG)
    assert len(outs) == 3
    s = CFG.img_size
    for (box, cls), stride in zip(outs, CFG.strides):
        assert box.shape == (B, s // stride, s // stride, 4 * CFG.reg_max)
        assert cls.shape == (B, s // stride, s // stride, T)
    outs0 = [(b[:1], c[:1]) for b, c in outs]
    boxes, scores = Y.decode_boxes(outs0, CFG)
    n_anchors = sum((s // st) ** 2 for st in CFG.strides)
    assert boxes.shape == (n_anchors, 4)
    assert scores.shape == (n_anchors, T)
    assert np.isfinite(boxes).all() and (scores >= 0).all() \
        and (scores <= 1).all()


def test_detector_protocol(rng):
    params = Y.init_params(CFG, jax.random.PRNGKey(0), text_dim=32)
    text_emb = rng.normal(size=(3, 32)).astype(np.float32)
    det = Y.YoloWorldDetector(
        params, CFG, classes=["bed", "sofa", "plant"],
        text_embeddings=text_emb, confidence=0.0, iou_thr=0.5)
    img = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    out = det.detect(img)
    # random weights: just protocol correctness
    for d in out:
        assert d.label in ("bed", "sofa", "plant")
        x1, y1, x2, y2 = d.xyxy
        assert 0 <= x1 <= 128 and 0 <= y1 <= 96
        assert 0.0 <= d.confidence <= 1.0


def test_decode_topk_matches_host_decode(rng):
    """Device-side batched decode+top-k agrees with the host decode_boxes
    path: the top-k candidates are the highest-confidence anchors with
    identical boxes/classes."""
    B, T = 2, 3
    params = Y.init_params(CFG, jax.random.PRNGKey(1), text_dim=32)
    text_emb = rng.normal(size=(T, 32)).astype(np.float32)
    text_emb /= np.linalg.norm(text_emb, axis=-1, keepdims=True)
    imgs = rng.uniform(size=(B, CFG.img_size, CFG.img_size, 3)
                       ).astype(np.float32)
    outs = Y.forward(params, jnp.asarray(imgs), jnp.asarray(text_emb), CFG)

    k = 16
    d_boxes, d_conf, d_cls = (np.asarray(a) for a in
                              Y.decode_topk_device(outs, CFG, k=k))
    def canon(boxes, conf, cls):
        # tie-robust ordering: equal confidences may rank differently
        # between the device top_k and host argsort
        order = np.lexsort((cls, boxes[:, 1], boxes[:, 0], -conf))
        return boxes[order], conf[order], cls[order]

    for b in range(B):
        per = [(box[b:b + 1], cls[b:b + 1]) for box, cls in outs]
        boxes, scores = Y.decode_boxes(per, CFG)
        conf = scores.max(axis=1)
        order = np.argsort(-conf, kind="stable")[:k]
        hb, hc, hk = canon(boxes[order], conf[order],
                           scores[order].argmax(1))
        db, dc, dk = canon(d_boxes[b], d_conf[b], d_cls[b])
        np.testing.assert_allclose(dc, hc, rtol=1e-5)
        np.testing.assert_allclose(db, hb, rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(dk, hk)


def test_detect_batch_matches_detect(rng):
    """detect_batch (device decode path) agrees with per-frame detect
    (host decode path) on boxes, labels, confidences."""
    params = Y.init_params(CFG, jax.random.PRNGKey(2), text_dim=32)
    text_emb = rng.normal(size=(3, 32)).astype(np.float32)
    det = Y.YoloWorldDetector(
        params, CFG, classes=["bed", "sofa", "plant"],
        text_embeddings=text_emb, confidence=0.3, iou_thr=0.5)
    imgs = rng.integers(0, 255, size=(3, 96, 128, 3), dtype=np.uint8)
    batched = det.detect_batch(imgs)
    for b in range(3):
        single = det.detect(imgs[b])
        key = lambda d: (-d.confidence, d.label)
        bs, ss = sorted(batched[b], key=key), sorted(single, key=key)
        assert [d.label for d in bs] == [d.label for d in ss]
        np.testing.assert_allclose(
            [d.confidence for d in bs], [d.confidence for d in ss],
            rtol=1e-5)
        np.testing.assert_allclose(
            np.array([d.xyxy for d in bs]).reshape(-1, 4),
            np.array([d.xyxy for d in ss]).reshape(-1, 4),
            rtol=1e-4, atol=1e-2)


def test_convert_ultralytics_forward_parity():
    """The converter + JAX forward reproduce an INDEPENDENT torch
    implementation of yolov8-worldv2 (tests/torch_yolo_oracle.py,
    written from the public architecture spec) bit-for-bit at f32:
    validates BN folding, HWIO transposes, the max-sigmoid text gate,
    DFL box branch, and the BN-contrastive head incl. logit_scale.exp().
    This is the strongest checkpoint-free converter validation this
    offline environment allows (real yolov8x-worldv2 weights load
    through exactly this key mapping)."""
    import torch
    import torch_yolo_oracle as O

    cfg = CFG    # YOLO_TEST: width .125, depth 1/3, embed 32, img 64
    T = 3
    gc = cfg.embed_dim      # text dim == embed dim (no txt_proj)
    oracle = O.YoloWorldOracle(
        w=cfg.ch, n=cfg.n,
        ecs=[cfg.ch(256), cfg.ch(128), cfg.ch(256), cfg.ch(512)],
        nhs=[8, 4, 8, 16],
        embed_dim=cfg.embed_dim, gc=gc, reg_max=cfg.reg_max)
    O.randomize_(oracle, seed=3)

    params = Y.convert_ultralytics(oracle.state_dict(), cfg, strict=True)

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, size=(2, cfg.img_size, cfg.img_size, 3)
                      ).astype(np.float32)
    txt = rng.normal(size=(T, gc)).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)

    with torch.no_grad():
        t_outs = oracle(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(np.broadcast_to(txt, (2, T, gc)).copy()))

    j_outs = Y.forward(params, jnp.asarray(img), jnp.asarray(txt), cfg)

    assert len(j_outs) == len(t_outs) == 3
    for lvl, ((jb, jc), (tb, tc)) in enumerate(zip(j_outs, t_outs)):
        tb = tb.permute(0, 2, 3, 1).numpy()       # NCHW -> NHWC
        tc = tc.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(jb), tb, rtol=2e-4,
                                   atol=2e-4,
                                   err_msg=f"box level {lvl}")
        np.testing.assert_allclose(np.asarray(jc), tc, rtol=2e-4,
                                   atol=2e-4,
                                   err_msg=f"cls level {lvl}")


def test_convert_ultralytics_strict_catches_drops():
    """strict=True flags layout drift instead of silently dropping
    weights."""
    import torch
    import torch_yolo_oracle as O

    cfg = CFG
    oracle = O.YoloWorldOracle(
        w=cfg.ch, n=cfg.n,
        ecs=[cfg.ch(256), cfg.ch(128), cfg.ch(256), cfg.ch(512)],
        nhs=[8, 4, 8, 16],
        embed_dim=cfg.embed_dim, gc=cfg.embed_dim, reg_max=cfg.reg_max)
    sd = oracle.state_dict()
    sd["model.23.rogue.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="unconsumed"):
        Y.convert_ultralytics(sd, cfg, strict=True)


def test_detect_batch_instances_matches_host_chain():
    """YoloWorldDetector.detect_batch_instances (the fully device-side
    long-term feed the agent flush uses) == detect_batch + host
    instances_from_detections."""
    from bsc_nav_tpu.config import small_test_config
    from bsc_nav_tpu.memory import longterm as LT

    cfg = CFG
    nav_cfg = small_test_config()
    params = Y.init_params(cfg, jax.random.PRNGKey(0), text_dim=cfg.embed_dim)
    rng = np.random.default_rng(4)
    classes = ["bed", "sofa", "chair"]
    temb = rng.normal(size=(3, cfg.embed_dim)).astype(np.float32)
    # threshold below sigmoid(logit_bias=-10) ~ 4.5e-5 so the
    # random-weight detector actually fires
    det = Y.YoloWorldDetector(params, cfg, classes, temb, confidence=1e-5)

    B = 2
    H = W = nav_cfg.sensor.height
    rgbs = rng.integers(0, 255, size=(B, H, W, 3), dtype=np.uint8)
    depths = rng.uniform(0.3, 9.0, size=(B, H, W)).astype(np.float32)
    cam_tfs = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    cam_tfs[:, :3, 3] = rng.uniform(-1, 1, size=(B, 3))

    got = det.detect_batch_instances(rgbs, depths, cam_tfs, nav_cfg)

    # host chain over the SAME candidate pool size the device path
    # decodes (det.decode_k, which also matches detect_batch's k=256;
    # with random weights every conf ties at sigmoid(-10) so a pool of
    # a DIFFERENT size would pick different edge candidates)
    x = jnp.asarray(rgbs, jnp.float32) / 255.0
    x = jax.image.resize(x, (B, cfg.img_size, cfg.img_size, 3),
                         "bilinear")
    boxes, conf, cls_idx = (np.asarray(a) for a in Y.decode_topk_device(
        Y.forward(params, x, jnp.asarray(det.text_emb), cfg), cfg,
        k=det.decode_k))
    want = []
    for b in range(B):
        sel = conf[b] >= det.confidence
        dets = det._nms_detections(boxes[b][sel], cls_idx[b][sel],
                                   conf[b][sel], H, W)
        want += LT.instances_from_detections(dets, depths[b], cam_tfs[b],
                                             nav_cfg)
    key = lambda d: (d["label"], round(d["confidence"], 4),
                     tuple(d["loc"]))
    assert len(got) > 0, "random detector at conf 0.001 must fire"
    assert sorted(map(key, got)) == sorted(map(key, want))
