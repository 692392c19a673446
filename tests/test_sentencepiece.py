"""Pure-Python sentencepiece unigram: proto roundtrip, Viterbi, decode."""

import numpy as np

from bsc_nav_tpu.models.sentencepiece import (
    BYTE, CONTROL, NORMAL, UNKNOWN, WS, SentencePieceUnigram,
    parse_model_proto, serialize_model_proto, tokenize_t5)


def build_toy_model(with_bytes=False):
    pieces = [
        ("<pad>", 0.0, CONTROL),        # 0
        ("</s>", 0.0, CONTROL),         # 1
        ("<unk>", 0.0, UNKNOWN),        # 2
        (WS, -3.0, NORMAL),             # 3
        (WS + "hello", -1.0, NORMAL),   # 4  beats hel+lo (-2.5-2.5)
        (WS + "hel", -2.5, NORMAL),     # 5
        ("lo", -2.5, NORMAL),           # 6
        (WS + "world", -1.2, NORMAL),   # 7
        ("l", -4.0, NORMAL),            # 8
        ("o", -4.0, NORMAL),            # 9
        ("h", -4.0, NORMAL),            # 10
        ("e", -4.0, NORMAL),            # 11
    ]
    if with_bytes:
        pieces += [(f"<0x{b:02X}>", -6.0, BYTE) for b in range(256)]
    return pieces


def make_sp(with_bytes=False):
    data = serialize_model_proto(build_toy_model(with_bytes))
    return SentencePieceUnigram.from_model_bytes(data)


def test_proto_roundtrip():
    pieces = build_toy_model()
    parsed = parse_model_proto(serialize_model_proto(pieces))
    assert [p for p, _, _ in parsed] == [p for p, _, _ in pieces]
    np.testing.assert_allclose([s for _, s, _ in parsed],
                               [s for _, s, _ in pieces], atol=1e-6)
    assert [t for _, _, t in parsed] == [t for _, _, t in pieces]


def test_viterbi_prefers_high_score_segmentation():
    sp = make_sp()
    ids, toks = sp.encode("hello", out_pieces=True)
    assert toks == [WS + "hello"]          # not ▁hel + lo
    ids2, toks2 = sp.encode("hello world", out_pieces=True)
    assert toks2 == [WS + "hello", WS + "world"]


def test_viterbi_falls_back_to_chars_then_unk():
    sp = make_sp()
    # "holo" has no multi-char pieces: must go through single chars
    _, toks = sp.encode("holo", out_pieces=True)
    assert toks[0] == WS and toks[1:] == ["h", "o", "lo"]
    # "z" is not in the vocab at all -> <unk>
    ids = sp.encode("z")
    assert ids[-1] == 2


def test_byte_fallback_roundtrip():
    sp = make_sp(with_bytes=True)
    ids = sp.encode("héllo")              # é unseen -> utf-8 bytes
    assert any(sp.types[i] == BYTE for i in ids)
    assert sp.decode(ids) == "héllo"


def test_normalization_nfkc_and_whitespace():
    sp = make_sp()
    # NFKC folds the ligature ﬁ -> fi; extra whitespace collapses
    assert sp.normalize("  hello \t world ") == WS + "hello" + WS + "world"
    assert "fi" in sp.normalize("ﬁsh")


def test_decode_roundtrip_and_control_skipping():
    sp = make_sp()
    ids = sp.encode("hello world")
    assert sp.decode(ids) == "hello world"
    assert sp.decode([0, 1] + ids) == "hello world"   # pad/eos skipped


def test_tokenize_t5_shapes_eos_pad():
    sp = make_sp()
    batch = tokenize_t5(sp, ["hello world", "hello"], max_len=8)
    assert batch.shape == (2, 8) and batch.dtype == np.int32
    row = batch[0]
    n = int((row != 0).sum())
    assert row[n - 1] == 1                 # </s> terminates
    assert (batch[1] == 0).sum() >= 5      # short row is padded


def test_tokenize_t5_truncates():
    sp = make_sp()
    batch = tokenize_t5(sp, ["hello world hello world"], max_len=3)
    assert batch.shape == (1, 3)
    assert batch[0, -1] == 1               # eos survives truncation


def test_t5_encoder_accepts_tokenized_batch():
    """End-to-end: sentencepiece ids -> T5 encoder features."""
    import jax
    import jax.numpy as jnp
    from bsc_nav_tpu.models import t5

    sp = make_sp()
    ids = tokenize_t5(sp, ["hello world"], max_len=16)
    cfg = t5.T5_TEST
    assert ids.max() < cfg.vocab_size
    params = t5.init_params(cfg, jax.random.PRNGKey(0))
    feats = t5.encode(params, jnp.asarray(ids), cfg)
    assert feats.shape == (1, 16, cfg.dim)
    assert np.isfinite(np.asarray(feats)).all()
