"""bench.py's stdout record must ALWAYS fit the driver's ~1.8 KB stdout
tail capture (VERDICT r8 #7 fixed the overflow; VERDICT r9 #8 + round-9
ADVICE demand the budget be ASSERTED, not assumed — the record grows with
every headline query and error lists are unbounded on failing rounds).

Pure-Python: no SparkSession, no testdata.
"""

from __future__ import annotations

import json

import bench


def _record(n_queries: int, n_error_queries: int, n_setup_errors: int) -> dict:
    errors = {
        f"events_operator_query_{i:03d}": "traceback tail"
        for i in range(n_error_queries)
    }
    errors.update(
        {f"_setup_step_{i}": "traceback tail" for i in range(n_setup_errors)}
    )
    rec = {
        "metric": "headline_queries_total_sec",
        "value": None if errors else 123.456,
        "unit": "sec",
        "queries": {
            f"events_operator_query_{i:03d}": 12.345
            for i in range(n_queries)
        },
        "sf": 0.1,
        "n_queries": n_queries,
        "n_failed": n_error_queries,
        "solo": True,
        "stable20_subtotal_sec": 64.5,
        "full_dag_build_sec": 43.6,
        "full_dag_tables": 50,
        "effective_cores": 20.1,
        "steal_pct": 1.1,
    }
    if errors:
        rec["errors"] = errors
    return rec


def test_healthy_round_fits_budget_untruncated():
    # pin the LIVE headline NAMES (35 at round 11) so growth that would
    # overflow the driver's stdout tail capture fails here first. Real
    # names, not synthetic ones: the budget is spent on actual name
    # bytes, so this is the enforcement point for "keep headline names
    # short" — at 35 queries the old 22-char synthetic names would
    # overflow while the live set fits with ~200 B headroom.
    n = len(bench.HEADLINE)
    assert n >= 31
    rec = _record(n, 0, 0)
    rec["queries"] = {name: 12.345 for name in bench.HEADLINE}
    c = bench.compact_record(rec, "/x/BENCH_LAST_FULL.json")
    assert len(json.dumps(c)) <= bench._COMPACT_BUDGET
    assert "queries" in c and len(c["queries"]) == n
    assert "error_queries" not in c


def test_failing_round_truncates_error_lists_before_queries():
    c = bench.compact_record(_record(35, 30, 6), "/x/BENCH_LAST_FULL.json")
    assert len(json.dumps(c)) <= bench._COMPACT_BUDGET
    assert c["error_queries"] == sorted(
        f"events_operator_query_{i:03d}" for i in range(30)
    )[:5]
    assert c["error_queries_elided"] == 25
    # per-query walls survive as long as the truncated record fits
    assert "queries" in c or c.get("queries_elided_see_full_record")


def test_pathological_round_always_fits():
    """Worst realistic shape: a huge headline set AND mass failure —
    the record must still parse and carry counts + the sidecar pointer."""
    c = bench.compact_record(_record(120, 120, 10), "/x/BENCH_LAST_FULL.json")
    assert len(json.dumps(c)) <= bench._COMPACT_BUDGET
    assert c["n_queries"] == 120 and c["n_failed"] == 120
    assert c["full_record"] == "/x/BENCH_LAST_FULL.json"
    assert c.get("queries_elided_see_full_record") is True


def test_compact_keys_are_stable():
    """The driver-side parser reads these keys; renames are breaking."""
    c = bench.compact_record(_record(5, 0, 0), None)
    for key in (
        "metric",
        "value",
        "unit",
        "queries",
        "sf",
        "n_queries",
        "n_failed",
        "solo",
        "stable20_subtotal_sec",
        "full_dag_build_sec",
        "full_dag_tables",
        "effective_cores",
        "steal_pct",
        "full_record",
    ):
        assert key in c, key
