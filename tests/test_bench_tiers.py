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
                  query_step, startup_only, imag_cache=None):
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


def test_pin_unknown_name_raises(tiny_cfg, monkeypatch):
    """A typo'd pin must fail loudly, not silently run the whole
    ladder and label the result with a different tier."""
    with pytest.raises(ValueError, match="BENCH_TEXTQ_TIER"):
        _phase(tiny_cfg, monkeypatch, {},
               env={"BENCH_TEXTQ_TIER": "fussed+t5"})


def test_pin_wins_over_precompiled_slice(tiny_cfg, monkeypatch):
    """A pin names the tier to MEASURE even when the empty-chip
    precompile already descended past it (deliberate A/B override);
    previously the post-slice filter matched nothing and the `or`
    fallback silently ran the sliced ladder instead."""
    calls, _ = _phase(tiny_cfg, monkeypatch, {}, precompiled="fused",
                      env={"BENCH_TEXTQ_TIER": "fused+t5"})
    assert [c[0] for c in calls] == ["fused+t5"]


def test_imagination_reused_across_attempts(tiny_cfg, monkeypatch):
    """Each tier attempt used to rebuild the full imagination stack
    (30-116 s of param init through the tunnel per attempt,
    docs/startup_r05.json).  Attempts sharing a use_t5 value must
    reuse the built stack; a use_t5 flip must evict it first (the T5
    tree alone is 4.7 GB on the 16 GB chip)."""
    import bsc_nav_tpu.memory.pipeline as P

    builds = []

    class _FakeImag:
        pass

    monkeypatch.setattr(
        bench, "_make_imagination",
        lambda full, use_t5, abstract=False:
            builds.append(use_t5) or _FakeImag())

    def boom(*a, **k):
        raise RuntimeError("deterministic compile crash")
    monkeypatch.setattr(P, "make_text_query_step", boom)
    monkeypatch.setattr(P, "make_text_pool_step", boom)
    monkeypatch.delenv("BENCH_SKIP_TEXTQ", raising=False)
    monkeypatch.delenv("BENCH_TEXTQ_TIER", raising=False)

    state_box = [init_store(tiny_cfg.memory, store_dtype=jnp.bfloat16)]
    with pytest.raises(RuntimeError, match="all text-query tiers"):
        bench._text_query_phase(
            tiny_cfg, True, state_box, params=None, vit_cfg=None,
            rng=None, query_step=None)
    # attempt sequence (2 per tier): fused+t5, split+t5 (T) -> fused,
    # split (F) -> two-program+t5 (T) -> two-program (F); the one-slot
    # cache rebuilds only on use_t5 flips
    assert builds == [True, False, True, False]


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


def test_startup_total_excludes_imag_subtimings(monkeypatch):
    """The imag_* entries are per-model sub-timings INSIDE the
    imagination_init interval; summing both double-counted ~30-45 s
    and failed a genuinely warm --assert-warm run (reported 191.1 s
    for a true ~146 s wall).  bench._startup_total and
    warm_start_check.check_warm must both exclude them."""
    import importlib.util
    import os as _os

    monkeypatch.setattr(bench, "STARTUP", {
        "imag_mmdit": 20.0, "imag_t5": 20.0, "imagination_init": 44.0,
        "text_query": 30.0, "build_step": 5.0})
    assert bench._startup_total() == 79.0          # not 119.0

    root = _os.path.dirname(_os.path.abspath(bench.__file__))
    spec = importlib.util.spec_from_file_location(
        "warm_start_check",
        _os.path.join(root, "tools", "warm_start_check.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    ok, problems = m.check_warm(bench.STARTUP, max_each=60.0,
                                max_total=85.0)
    assert ok, problems


def test_precompile_ladder_reaches_two_program(tiny_cfg, tmp_path,
                                               monkeypatch):
    """When every fused/split empty-chip precompile fails, the ladder
    must pre-seed the two-program fallback's programs too (sampler +
    query at the generated-image avals) -- otherwise the runtime's
    last-resort tier cold-compiles BOTH on a loaded chip, round 4's
    exact failure mode.  Failure markers must land for the dead legs."""
    import bsc_nav_tpu.memory.pipeline as P
    from bsc_nav_tpu.memory.pipeline import make_query_step
    from bsc_nav_tpu.models import vit

    def boom(*a, **k):
        raise RuntimeError("compile server says no")
    monkeypatch.setattr(P, "make_text_query_step", boom)
    monkeypatch.setattr(P, "make_text_pool_step", boom)
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("BENCH_RETRY_FAILED_PRECOMPILE", raising=False)
    monkeypatch.delenv("BENCH_T5", raising=False)

    vit_cfg = vit.ViTConfig(img_size=28, patch_size=14, dim=64,
                            depth=1, heads=2, num_registers=1)
    qs = make_query_step(tiny_cfg, vit_cfg, compute_dtype=jnp.bfloat16)
    got = bench._precompile_textq(tiny_cfg, False, vit_cfg,
                                  jnp.bfloat16, vit_int8=False,
                                  query_step=qs)
    assert got == "two-program"
    markers = {p.name for p in tmp_path.iterdir()}
    assert "textq_precompile_failed_fused" in markers
    assert "textq_precompile_failed_split" in markers


def test_all_tiers_fail_raises_with_last_error(tiny_cfg, monkeypatch):
    boom = RuntimeError("deterministic compile crash")
    outcomes = {n: boom for n in (
        "fused+t5", "split+t5", "fused", "split", "two-program+t5",
        "two-program")}
    with pytest.raises(RuntimeError, match="all text-query tiers"):
        _phase(tiny_cfg, monkeypatch, outcomes)
