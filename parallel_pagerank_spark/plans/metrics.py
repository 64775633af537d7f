"""Metrics result sinks (SURVEY.md §2 A6/A7).

The reference's benchmark harness dumps run records to JSON and CSV
(benchmark/benchmark.py:126-149); these helpers are the engine-side
equivalent for superstep metrics and benchmark records — structured data,
never regex-parsed stdout (the reference's tooling parses printf lines,
compare_methods.py:49-134)."""

from __future__ import annotations

import csv
import json


def metrics_to_json(metrics: list[dict], path: str) -> None:
    with open(path, "w") as f:
        json.dump(metrics, f, indent=1)


def metrics_to_csv(metrics: list[dict], path: str) -> None:
    if not metrics:
        with open(path, "w") as f:
            f.write("")
        return
    keys = list(metrics[0].keys())
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(metrics)
