"""WordPiece tokenizer parity vs transformers.BertTokenizer, and the
GroundingDinoDetector wrapper smoke test (tiny random-init config)."""

import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from bsc_nav_tpu.models.wordpiece import (WordPieceTokenizer,
                                          classes_to_prompt)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", ".", ",", "?",
         "a", "the", "sofa", "chair", "bed", "pot", "##ted", "plant",
         "tele", "##vision", "tv", "refrig", "##er", "##ator", "wash",
         "##ing", "machine", "co", "##ffee", "table", "night", "##stand",
         "un", "##know", "##n"]


@pytest.fixture()
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_wordpiece_matches_bert_tokenizer(vocab_file):
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(vocab_file)

    prompts = [
        "sofa. chair. potted plant. television.",
        "Refrigerator, washing machine?  coffee TABLE ... nightstand",
        "the\tweird   spacing\nand CAFÉ accents",   # café -> cafe
        "unsplittablewordzzz",
    ]
    for text in prompts:
        assert ours.tokenize(text) == hf.tokenize(text), text
        assert ours.encode(text) == hf.encode(text), text


def test_classes_to_prompt():
    assert (classes_to_prompt(["Sofa", "potted plant."])
            == "sofa. potted plant.")


def test_grounding_dino_detector_smoke():
    """Tiny random-init detector end to end through the Detection
    protocol (threshold 0 so random weights yield detections)."""
    import jax

    from bsc_nav_tpu.models import grounding_dino as G
    from tests.test_grounding_dino import TINY

    params = G.init_params(TINY, jax.random.PRNGKey(0))
    # "[CLS] w . w . [SEP]" -> two phrases for two classes
    ids = np.array([[101, 7, 1012, 9, 1012, 102]], np.int32)
    det = G.GroundingDinoDetector(
        params, TINY, ["sofa", "chair"], input_ids=ids,
        confidence=0.0, image_size=64)
    rgb = np.random.default_rng(0).integers(
        0, 255, (48, 48, 3), np.uint8)
    dets = det.detect(rgb)
    assert len(dets) > 0
    for d in dets:
        assert d.label in ("sofa", "chair")
        x1, y1, x2, y2 = d.xyxy
        assert 0 <= x1 <= 48 and 0 <= y1 <= 48
