"""bench.py text-query tier ladder (host logic, VERDICT r4 item 1).

The ladder has bitten twice on real TPU runs: round 4 shipped a null
because the only tier attempted died in compile, and round-5 run 2
OOMed every tier because the loop retained the failed tier's exception
object (whose traceback pinned the 4.7 GB T5 tree).  These tests pin
the contract with mocked tiers:

  - tier order with/without T5, and the precompiled-tier fast-start
    (everything above the precompiled tier is skipped);
  - one retry per tier for transient failures, with "+retry" recorded;
  - OOM failures short-circuit to the next (smaller) tier, no retry;
  - the failed tier's exception object is NOT retained across tiers
    (weakref-dead after the phase returns);
  - BENCH_TEXTQ_TIER pins a single tier;
  - the bf16 store is quantized to int8 before any T5 tier runs
    (16 GB budget, bench.py:819-830) and text_query_store records it.
"""

import gc
import weakref

import jax.numpy as jnp
import pytest

import bench
from bsc_nav_tpu.config import Config, MemoryConfig
from bsc_nav_tpu.memory.store import init_store


@pytest.fixture()
def tiny_cfg():
    return Config(memory=MemoryConfig(
        grid_size=32, token_dim=64, cache_size=4,
        voxel_capacity=(1 << 8) - 8))


def _phase(cfg, monkeypatch, outcomes, *, full=True, precompiled=None,
           store_dtype=jnp.bfloat16, env=None):
    """Run _text_query_phase with _run_text_tier mocked.

    outcomes: dict tier-name -> 'ok' | exception instance to raise
    (re-raised fresh per attempt) | list of per-attempt outcomes.
    Returns (calls, result) where calls = [(name, use_t5, mode), ...].
    """
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)
    monkeypatch.delenv("BENCH_SKIP_TEXTQ", raising=False)
    calls = []
    attempts = {}

    def fake_tier(cfg_, full_, state, params, vit_cfg, use_t5, mode,
                  query_step, startup_only):
        name = mode if not use_t5 else mode + "+t5"
        # map back to ladder names (two-program keeps its dash)
        name = {"fused+t5": "fused+t5", "split+t5": "split+t5",
                "fused": "fused", "split": "split",
                "two-program+t5": "two-program+t5",
                "two-program": "two-program"}[name]
        calls.append((name, use_t5, mode, state.feats.dtype))
        out = outcomes.get(name, "ok")
        if isinstance(out, list):
            out = out[min(attempts.get(name, 0), len(out) - 1)]
            attempts[name] = attempts.get(name, 0) + 1
        if out == "ok":
            return 123.0, 45.0
        raise out

    monkeypatch.setattr(bench, "_run_text_tier", fake_tier)
    bench._TEXTQ_T5[0] = bench._TEXTQ_PATH[0] = None
    bench._TEXTQ_STORE[0] = None
    state_box = [init_store(cfg.memory, store_dtype=store_dtype)]
    res = bench._text_query_phase(
        cfg, full, state_box, params=None, vit_cfg=None, rng=None,
        query_step=None, precompiled=precompiled)
    return calls, res


def test_first_tier_wins(tiny_cfg, monkeypatch):
    calls, res = _phase(tiny_cfg, monkeypatch, {})
    assert [c[0] for c in calls] == ["fused+t5"]
    assert res == (123.0, 45.0)
    assert bench._TEXTQ_PATH[0] == "fused+t5"
    assert bench._TEXTQ_T5[0] is True


def test_ladder_order_and_descent(tiny_cfg, monkeypatch):
    boom = RuntimeError("INTERNAL: remote_compile HTTP 500")
    calls, res = _phase(tiny_cfg, monkeypatch, {
        "fused+t5": boom, "split+t5": boom, "fused": boom,
        "split": boom, "two-program+t5": boom})
    # transient (non-OOM) failures: each tier tried twice, in order
    assert [c[0] for c in calls] == [
        "fused+t5", "fused+t5", "split+t5", "split+t5",
        "fused", "fused", "split", "split",
        "two-program+t5", "two-program+t5", "two-program"]
    assert res == (123.0, 45.0)
    assert bench._TEXTQ_PATH[0] == "two-program"
    assert bench._TEXTQ_T5[0] is False


def test_retry_once_records_suffix(tiny_cfg, monkeypatch):
    calls, res = _phase(tiny_cfg, monkeypatch, {
        "fused+t5": [RuntimeError("transient tunnel 500"), "ok"]})
    assert [c[0] for c in calls] == ["fused+t5", "fused+t5"]
    assert res == (123.0, 45.0)
    assert bench._TEXTQ_PATH[0] == "fused+t5+retry"


def test_oom_skips_retry(tiny_cfg, monkeypatch):
    oom = RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating")
    calls, _ = _phase(tiny_cfg, monkeypatch, {"fused+t5": oom})
    # the OOM tier is attempted ONCE (same footprint would OOM again)
    assert [c[0] for c in calls][:2] == ["fused+t5", "split+t5"]


def test_precompiled_tier_fast_start(tiny_cfg, monkeypatch):
    calls, _ = _phase(tiny_cfg, monkeypatch, {}, precompiled="split+t5")
    # everything above the precompiled tier failed on an EMPTY chip;
    # a loaded-chip attempt is doomed -- start at the working tier
    assert [c[0] for c in calls] == ["split+t5"]


def test_pin_env(tiny_cfg, monkeypatch):
    calls, _ = _phase(tiny_cfg, monkeypatch, {},
                      env={"BENCH_TEXTQ_TIER": "two-program"})
    assert [c[0] for c in calls] == ["two-program"]


def test_failed_tier_exception_not_retained(tiny_cfg, monkeypatch):
    """Round-5 run-2 regression: the tier loop kept the failed tier's
    exception OBJECT, whose traceback pinned multi-GB param trees into
    every later tier.  Only the message string may survive the tier."""
    class Payload:
        pass

    payload = Payload()
    err = RuntimeError("boom with payload")
    err.payload = payload          # stands in for the 4.7 GB T5 tree
    ref = weakref.ref(payload)
    outcomes = {"fused+t5": err}
    calls, res = _phase(tiny_cfg, monkeypatch, outcomes)
    assert res == (123.0, 45.0)
    assert bench._TEXTQ_PATH[0] == "split+t5"
    # drop the TEST's own references (the mocked tier closure holds
    # `outcomes` until monkeypatch teardown) -- what remains reachable
    # after this is whatever BENCH retained, which must be nothing
    outcomes.clear()
    del err, payload
    gc.collect()
    assert ref() is None, "failed-tier exception (and its traceback) " \
                          "must not be retained across tiers"


def test_t5_tiers_get_int8_store(tiny_cfg, monkeypatch):
    calls, _ = _phase(tiny_cfg, monkeypatch, {},
                      store_dtype=jnp.bfloat16)
    # want_t5 => the bf16 store must be converted before the tier runs
    assert calls[0][3] == jnp.int8
    assert bench._TEXTQ_STORE[0] == "int8"


def test_no_t5_keeps_store_dtype(tiny_cfg, monkeypatch):
    calls, _ = _phase(tiny_cfg, monkeypatch, {},
                      env={"BENCH_T5": "0"})
    assert [c[0] for c in calls] == ["fused"]
    assert calls[0][3] == jnp.bfloat16
    assert bench._TEXTQ_STORE[0] == "bfloat16"
    assert bench._TEXTQ_T5[0] is False


def test_all_tiers_fail_raises_with_last_error(tiny_cfg, monkeypatch):
    boom = RuntimeError("deterministic compile crash")
    outcomes = {n: boom for n in (
        "fused+t5", "split+t5", "fused", "split", "two-program+t5",
        "two-program")}
    with pytest.raises(RuntimeError, match="all text-query tiers"):
        _phase(tiny_cfg, monkeypatch, outcomes)
