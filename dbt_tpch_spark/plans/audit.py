"""Self-service physical-plan audit: the facts a scale review asks of any
query — how many shuffles, what the parquet scans read and push down,
which joins broadcast, whether any unpartitioned window consumes
non-aggregated input — as a dict, so the checks the CI budgets pin
(tests/test_plan_budgets.py) are available to users as an API instead of
folklore."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


def unpartitioned_window_offenders(df: DataFrame) -> list:
    """Unpartitioned Window nodes whose input subtree has no Aggregate —
    the single-partition scale-killer shape. Post-aggregation
    (report-cardinality) inputs are acceptable and excluded."""
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = []
    for n in _walk(plan):
        if n.nodeName() == "Window" and n.partitionSpec().isEmpty():
            sub = [m.nodeName() for m in _walk(n.children().apply(0))]
            if "Aggregate" not in sub:
                bad.append(sub[:6])
    return bad


def audit_plan(df: DataFrame) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    shuffles = [
        ln.strip()
        for ln in lines
        if "Exchange" in ln and "BroadcastExchange" not in ln and "Reused" not in ln
    ]
    broadcasts = [ln.strip() for ln in lines if "BroadcastExchange" in ln]
    scans = []
    for ln in lines:
        if "FileScan parquet" not in ln:
            continue
        cols = ln.split("FileScan parquet [")[1].split("]")[0]
        m = re.search(r"DataFilters: \[([^\]]*)\]", ln)
        scans.append(
            {
                "columns": [c.split("#")[0] for c in cols.split(",") if c],
                "pushed_filters": (m.group(1) if m else ""),
            }
        )
    return {
        "n_shuffles": len(shuffles),
        "shuffles": shuffles,
        "n_broadcasts": len(broadcasts),
        "scans": scans,
        "unpartitioned_window_offenders": unpartitioned_window_offenders(df),
        "plan": plan,
    }


def format_audit(report: dict) -> str:
    """One-paragraph human summary (drops the raw plan)."""
    scan_bits = "; ".join(
        f"scan[{', '.join(s['columns'][:6])}{'…' if len(s['columns']) > 6 else ''}]"
        + (f" pushed({s['pushed_filters'][:60]})" if s["pushed_filters"] else "")
        for s in report["scans"]
    )
    flag = (
        " !! UNPARTITIONED WINDOW OVER RAW DATA"
        if report["unpartitioned_window_offenders"]
        else ""
    )
    return (
        f"{report['n_shuffles']} shuffle(s), "
        f"{report['n_broadcasts']} broadcast(s); {scan_bits}{flag}"
    )
