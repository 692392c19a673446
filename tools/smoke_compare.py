"""Compare two tpu_smoke artifacts and flag serving-latency regressions.

The smoke artifact (tools/tpu_smoke.last.json, plus per-round snapshots
docs/tpu_smoke_r*.json) records ms/iter per served model; this gate
makes cross-round perf drift reproducible-by-diff instead of README
prose.

  python tools/smoke_compare.py docs/tpu_smoke_r02.json \
      tools/tpu_smoke.last.json [--threshold 0.10]

Exit code 1 if any model regressed by more than the threshold.
"""

from __future__ import annotations

import argparse
import json
import sys


def compare(base: dict, new: dict, threshold: float = 0.10):
    """Returns (report_rows, regressions).  Models present only on one
    side are reported but never counted as regressions (coverage may
    grow between rounds)."""
    base_ms = {m["name"]: m["ms_per_iter"] for m in base.get("models", [])}
    rows, regressions = [], []
    for m in new.get("models", []):
        name, ms = m["name"], m["ms_per_iter"]
        if name not in base_ms:
            rows.append((name, None, ms, None))
            continue
        b = base_ms[name]
        rel = (ms - b) / b if b else 0.0
        rows.append((name, b, ms, rel))
        if rel > threshold:
            regressions.append((name, b, ms, rel))
    for name, b in base_ms.items():
        if name not in {m["name"] for m in new.get("models", [])}:
            rows.append((name, b, None, None))
    return rows, regressions


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("base")
    p.add_argument("new")
    p.add_argument("--threshold", type=float, default=0.10)
    args = p.parse_args(argv)
    with open(args.base) as f:
        base = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    rows, regressions = compare(base, new, args.threshold)
    for name, b, ms, rel in rows:
        if b is None:
            print(f"{name:<40} NEW       {ms:8.1f} ms")
        elif ms is None:
            print(f"{name:<40} {b:8.1f} ms  -> (dropped)")
        else:
            print(f"{name:<40} {b:8.1f} -> {ms:8.1f} ms  ({rel:+.1%})")
    if regressions:
        print(f"REGRESSION: {len(regressions)} model(s) slower by "
              f">{args.threshold:.0%}", file=sys.stderr)
        return 1
    print("no regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
