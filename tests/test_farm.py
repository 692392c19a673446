"""Multi-host episode farming exercised for real: two localhost worker
processes run the objnav driver with worker-sharded episodes, their CSV
shards are merged, and the merged results must equal a single-worker
run over the same deterministic episode sequence (reference analog:
per-GPU shell launches, scripts/run_objnav_hm3d.sh)."""

import csv
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EPISODES = 4


def _worker_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    return env


def _run_driver(tmp_path, csv_name, extra):
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from benchmarks import objnav\n"
        f"objnav.main({extra!r})\n"
    )
    return subprocess.Popen(
        [sys.executable, "-c", code], cwd=REPO, env=_worker_env(),
        stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)


def _rows(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def test_two_worker_farm_matches_single_run(tmp_path):
    shard = [str(tmp_path / "r.worker0.csv"), str(tmp_path / "r.worker1.csv")]
    common = ["--env", "fake", "--episodes", str(EPISODES), "--llm", "mock",
              "--log-root", str(tmp_path / "logs"),
              # keep retrieval artifacts out of the repo root (the
              # driver default is ./memory relative to its cwd=REPO)
              "--memory-root", str(tmp_path / "mem")]
    procs = [
        _run_driver(tmp_path, s, common + [
            "--csv", s, "--num-workers", "2", "--worker-id", str(w)])
        for w, s in enumerate(shard)
    ]
    for p in procs:
        assert p.wait(timeout=600) == 0

    from benchmarks import farm
    merged = str(tmp_path / "merged.csv")
    n = farm.merge_csvs(shard, merged)
    assert n == EPISODES

    # ground truth: one worker running everything
    single = str(tmp_path / "single.csv")
    p = _run_driver(tmp_path, single, common + ["--csv", single])
    assert p.wait(timeout=600) == 0

    got = sorted(_rows(merged), key=lambda r: r["object_goal"])
    want = sorted(_rows(single), key=lambda r: r["object_goal"])
    assert len(got) == len(want) == EPISODES
    for g, w in zip(got, want):
        assert g["object_goal"] == w["object_goal"]
        assert g["id"] == w["id"]
        assert float(g["success"]) == float(w["success"])
        assert abs(float(g["spl"]) - float(w["spl"])) < 1e-6


def test_shard_episodes_partition():
    from benchmarks import farm
    all_eps = sorted(
        farm.shard_episodes(10, num_workers=3, worker_id=0)
        + farm.shard_episodes(10, num_workers=3, worker_id=1)
        + farm.shard_episodes(10, num_workers=3, worker_id=2))
    assert all_eps == list(range(10))
