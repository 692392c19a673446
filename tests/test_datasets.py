"""Dataset-loader tests over synthetic fixtures in the public formats."""

import gzip
import json
import math

import numpy as np

from bsc_nav_tpu.env import datasets as D


def write_gz(path, obj):
    with gzip.open(path, "wt", encoding="utf-8") as f:
        json.dump(obj, f)


def test_objectnav_inline_goals(tmp_path):
    path = str(tmp_path / "val.json.gz")
    write_gz(path, {"episodes": [{
        "scene_id": "hm3d/val/00800-x/x.basis.glb",
        "start_position": [1.0, 0.2, -2.0],
        "start_rotation": [0, math.sin(0.5), 0, math.cos(0.5)],
        "object_category": "bed",
        "goals": [{"position": [3.0, 0.2, 4.0]}],
    }]})
    eps = D.load_objectnav_episodes(path)
    assert len(eps) == 1
    ep = eps[0]
    assert ep.object_category == "bed"
    np.testing.assert_allclose(ep.start_position, [1.0, 0.2, -2.0])
    assert abs(ep.start_yaw - 1.0) < 1e-6
    np.testing.assert_allclose(ep.goal_positions[0], [3.0, 0.2, 4.0])


def test_objectnav_dedup_goals_by_category(tmp_path):
    """The OVON/objectnav-v2 dedup layout (reference env.py:332-355)."""
    path = str(tmp_path / "val.json.gz")
    write_gz(path, {
        "episodes": [{
            "scene_id": "scenes/abc.glb",
            "start_position": [0, 0, 0],
            "start_rotation": [0, 0, 0, 1],
            "object_category": "sofa",
            "goals": [],
            "goals_key": "abc.glb_sofa",
        }],
        "goals_by_category": {
            "abc.glb_sofa": [{"position": [5.0, 0.0, 5.0]},
                             {"position": [6.0, 0.0, 5.0]}],
        },
    })
    eps = D.load_ovon_episodes(path)
    assert len(eps[0].goal_positions) == 2


def test_r2r_episodes(tmp_path):
    path = str(tmp_path / "r2r.json.gz")
    write_gz(path, {"episodes": [{
        "scene_id": "mp3d/XYZ/XYZ.glb",
        "start_position": [0, 0, 0],
        "start_rotation": [0, 0, 0, 1],
        "instruction": {"instruction_text": "Walk to the kitchen."},
        "goals": [{"position": [2, 0, 2]}],
    }]})
    eps = D.load_r2r_episodes(path)
    assert eps[0].instruction == "Walk to the kitchen."
    assert len(eps[0].goal_positions) == 1


def test_eqa_questions(tmp_path):
    path = str(tmp_path / "eqa.json")
    with open(path, "w") as f:
        json.dump([{
            "question_id": "q1",
            "question": "What is on the table?",
            "episode_history": "hm3d-v0/00800-TEEsavR23oF",
        }], f)
    qs = D.load_eqa_questions(path)
    assert qs[0]["scene"] == "TEEsavR23oF"
    assert qs[0]["question_id"] == "q1"
