"""Warm-start reproducibility (VERDICT r4 item 3), in CI-able form.

The real assertion needs the tunneled TPU and ~10+ minutes for the
seeding run, so the end-to-end test is opt-in via RUN_TPU_TESTS=1 and
must be run ALONE (one process per TPU).  The threshold logic itself is
always tested.
"""

import os

import pytest

from tools.warm_start_check import check_warm


def test_check_warm_thresholds():
    ok, probs = check_warm({"build_step": 4.1, "imagination_init": 18.9,
                            "text_query": 25.0}, 45.0, 150.0)
    assert ok and not probs
    ok, probs = check_warm({"imagination_init": 85.9}, 45.0, 150.0)
    assert not ok and "imagination_init" in probs[0]
    ok, probs = check_warm({"a": 40.0, "b": 40.0, "c": 40.0, "d": 40.0},
                           45.0, 150.0)
    assert not ok and "total" in probs[0]


@pytest.mark.skipif(not os.environ.get("RUN_TPU_TESTS"),
                    reason="needs the real TPU, exclusive + slow; "
                           "set RUN_TPU_TESTS=1 to run")
def test_fresh_process_hits_cache():
    """Driver-shaped check: a FRESH default-env process must reload the
    big programs from the persistent cache (seconds), not recompile
    (minutes).  First run seeds, second asserts."""
    from tools.warm_start_check import main
    assert main(["--seed", "--assert-warm"]) == 0
