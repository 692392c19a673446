"""CSV metric aggregation (reference metric_summ.py:4-38): drop
inf-distance rows, report overall and per-category SR / SPL / distance.

  python -m benchmarks.metric_summ results.csv
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

COLUMNS = ["success", "spl", "distance_to_goal", "object_goal", "id",
           "island", "island_area", "long_memory_query",
           "working_memory_query", "search_point"]


def compute_metrics(csv_file: str, has_header: bool = True):
    if has_header:
        df = pd.read_csv(csv_file)
    else:
        df = pd.read_csv(csv_file, header=None, names=COLUMNS)
    df = df[~df["distance_to_goal"].apply(np.isinf)]

    overall = {
        "success_rate": float(df["success"].mean()),
        "avg_spl": float(df["spl"].mean()),
        "avg_distance_to_goal": float(df["distance_to_goal"].mean()),
        "episodes": int(len(df)),
    }
    per_category = None
    if "object_goal" in df.columns:
        per_category = df.groupby("object_goal").agg(
            success_rate=("success", "mean"),
            avg_spl=("spl", "mean"),
            avg_distance_to_goal=("distance_to_goal", "mean"),
        ).reset_index()
    return overall, per_category


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    overall, per_category = compute_metrics(argv[0])
    print(f"overall success rate: {overall['success_rate']:.4f}")
    print(f"overall avg SPL:      {overall['avg_spl']:.4f}")
    print(f"overall avg distance: {overall['avg_distance_to_goal']:.4f}")
    if per_category is not None:
        print("\nper-category metrics:")
        print(per_category)
    return overall


if __name__ == "__main__":
    main()
