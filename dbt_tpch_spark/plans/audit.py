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


#: grouping-column names whose cardinality grows linearly with SF — an
#: unpartitioned window over an aggregate at one of these grains still
#: funnels an SF-linear frame through ONE WindowExec task (the round-3
#: verdict's fact-dimension-grain class: 150K customers at SF1 → 15M at
#: SF100). Bounded-domain grains (month, nation, status, band, bucket
#: index, …) pass.
_UNBOUNDED_KEY = re.compile(
    r"(^|_)("
    r"key|id|"  # customer_key, part_key, doc_id, user_id, event_id, …
    r"custkey|partkey|suppkey|orderkey|nationkey|regionkey|"  # raw tpch
    r"node|src|dst"  # graph node grains (one row per part/vertex)
    r")$"
)

#: vocabulary grains (shingles, terms, tokens, n-grams) also grow with the
#: corpus — sub-linearly (Heaps' law), but unboundedly: a window over a
#: term-grain aggregate still funnels a corpus-growing frame through one
#: task, so the WINDOW invariant treats them as unbounded.  Broadcasts of
#: vocab-grain aggregates are the documented exception (a df/vocab lookup
#: table is tens of MB at web scale — the canonical broadcast-dimension
#: shape for TF-IDF/BM25/PMI), so broadcast_hint_offenders uses
#: _UNBOUNDED_KEY alone.
_VOCAB_KEY = re.compile(r"(^|_)(shingle|term|token|ngram|gram|bigram)s?$")


def _nearest_aggregate_grain(node):
    """Grouping-column names of the aggregate nearest below ``node``
    (BFS — the node that determines the window input's cardinality), or
    None if no Aggregate exists in the subtree."""
    frontier = [node]
    while frontier:
        nxt = []
        for n in frontier:
            if n.nodeName() in ("GlobalLimit", "WindowGroupLimit"):
                # input already capped at a literal k (top-k re-rank shape,
                # e.g. global_topk output or InferWindowGroupLimit) —
                # bounded regardless of the grain below
                return []
            if n.nodeName() == "Aggregate":
                # an aggregate over a capped input is itself capped (e.g. a
                # distinct over per-query top-k hits) — bounded regardless
                # of the grouping grain
                for m in _walk(n):
                    if m is not n and m.nodeName() in (
                        "GlobalLimit",
                        "WindowGroupLimit",
                    ):
                        return []
                exprs = n.groupingExpressions()
                names = []
                for i in range(exprs.size()):
                    s = exprs.apply(i).toString()
                    names.append(s.split("#")[0].split(".")[-1].strip("'`"))
                return names
            for i in range(n.children().size()):
                nxt.append(n.children().apply(i))
        frontier = nxt
    return None


def unpartitioned_window_offenders(df: DataFrame) -> list:
    """Unpartitioned Window nodes whose input frame grows with SF — the
    single-partition scale-killer shape. Acceptable inputs are
    bounded-cardinality only: the subtree's nearest Aggregate must exist
    AND group by bounded-domain columns (month/nation/status/bucket …).
    An aggregate at ``*_key``/``*_id`` grain (customer/part/supplier/doc/
    user) is SF-linear and still flags — merely being "post-aggregation"
    is not enough (round-3 verdict, fact-dimension-grain class)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = []
    for n in _walk(plan):
        if n.nodeName() == "Window" and n.partitionSpec().isEmpty():
            grain = _nearest_aggregate_grain(n.children().apply(0))
            if grain is None:
                sub = [m.nodeName() for m in _walk(n.children().apply(0))]
                bad.append(["no-aggregate"] + sub[:6])
            else:
                hot = [
                    g
                    for g in grain
                    if _UNBOUNDED_KEY.search(g.lower())
                    or _VOCAB_KEY.search(g.lower())
                ]
                if hot:
                    bad.append(["sf-linear-grain"] + hot)
    return bad


def _hinted_sides(join_node):
    """(side_index, child) pairs of ``join_node`` carrying an explicit
    broadcast strategy hint (EliminateResolvedHint folds ``F.broadcast``
    wrappers into the Join's JoinHint during optimization)."""
    h = join_node.hint()
    out = []
    for idx, opt in ((0, h.leftHint()), (1, h.rightHint())):
        if opt.isDefined() and "broadcast" in opt.get().toString().lower():
            out.append((idx, join_node.children().apply(idx)))
    return out


def broadcast_hint_offenders(df: DataFrame) -> list:
    """Explicit ``F.broadcast`` hints whose hinted frame grows with SF —
    the hint is *hard* (AQE never demotes it), so a key-grain frame under
    one is a guaranteed OOM at some scale factor, unlike a planner-chosen
    broadcast that the size threshold retires automatically.

    A hinted side flags when its nearest Aggregate below groups by an
    SF-linear grain (``*_key``/``*_id``/graph-node columns — the same
    _UNBOUNDED_KEY the window invariant uses, round-4 verdict).  Exempt:
    scalar aggregates (empty grain), bounded-domain grains
    (month/nation/status/bucket…), GlobalLimit/WindowGroupLimit-capped
    subtrees, vocab grains (see _VOCAB_KEY), and hint-free subtrees (raw
    dimension broadcasts are selectivity-reviewed case by case; only the
    aggregate shape is mechanically decidable)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = []
    for n in _walk(plan):
        if n.nodeName() != "Join":
            continue
        for idx, child in _hinted_sides(n):
            grain = _nearest_aggregate_grain(child)
            if grain is None:
                continue
            hot = [g for g in grain if _UNBOUNDED_KEY.search(g.lower())]
            if hot:
                bad.append(["sf-linear-broadcast", "LR"[idx]] + hot)
    return bad


#: JVM RDD ids of checkpointed frames the engine has PROVEN bounded (built
#: from a GlobalLimit/fixed-size sample before the checkpoint erased the
#: provenance). localCheckpoint replaces the subtree with an opaque
#: LogicalRDD, so without this registry the pair-stage invariant could not
#: distinguish a checkpointed 512-row sample from a checkpointed corpus.
_BOUNDED_RDD_IDS: set[int] = set()


def _logical_rdd_ids(df: DataFrame) -> list[int]:
    ids = []
    for n in _walk(df._jdf.queryExecution().optimizedPlan()):
        if n.nodeName() == "LogicalRDD":
            ids.append(n.rdd().id())
    return ids


def mark_bounded(df: DataFrame) -> DataFrame:
    """Record that ``df`` (typically a just-checkpointed frame) has a
    fixed, SF-independent row bound — e.g. it was built from an
    ``orderBy(...).limit(K)`` sample or an iteratively-capped state frame.
    The pair-stage invariant treats its LogicalRDD leaves as bounded."""
    _BOUNDED_RDD_IDS.update(_logical_rdd_ids(df))
    return df


def bounded_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``localCheckpoint`` + :func:`mark_bounded` — the checkpoint used for
    provably fixed-size frames (samples, scalar state) whose boundedness
    must survive the checkpoint's provenance erasure."""
    return mark_bounded(df.localCheckpoint(eager=eager))


_BOUNDED_LEAVES = {
    "GlobalLimit",
    "WindowGroupLimit",
    "LocalRelation",
    "OneRowRelation",
    "Range",
}

#: a Filter like ``vec_id#12L < 32`` on a dense key column is a fixed
#: id-prefix sample (keys are dense 1..N, FIXTURES.md) — SF-independent.
_ID_PREFIX_FILTER = re.compile(r"\b(\w+)#\d+L? <=? \d+")


def _subtree_bounded(node) -> bool:
    """True if the subtree's row count has an SF-independent bound:
    a GlobalLimit/WindowGroupLimit cap, a literal relation, an Aggregate
    at bounded-domain grain (or scalar), or a checkpointed frame the
    engine registered via :func:`mark_bounded`."""
    for m in _walk(node):
        nn = m.nodeName()
        if nn in _BOUNDED_LEAVES:
            return True
        if nn == "LogicalRDD" and m.rdd().id() in _BOUNDED_RDD_IDS:
            return True
        if nn == "Filter":
            cond = m.condition().toString()
            if any(
                _UNBOUNDED_KEY.search(c.lower())
                for c in _ID_PREFIX_FILTER.findall(cond)
            ):
                return True
        if nn == "Aggregate":
            exprs = m.groupingExpressions()
            names = []
            for i in range(exprs.size()):
                s = exprs.apply(i).toString()
                names.append(s.split("#")[0].split(".")[-1].strip("'`"))
            if not any(
                _UNBOUNDED_KEY.search(g.lower()) or _VOCAB_KEY.search(g.lower())
                for g in names
            ):
                return True
    return False


def pair_stage_offenders(df: DataFrame) -> list:
    """Join nodes with NO equality conjunct (cartesian / pure theta) where
    NEITHER input subtree is provably bounded — the all-pairs scale-killer
    class (round-5 verdict): output grows O(n·m) with the corpus, unlike an
    equi-join whose output is bounded by key-collision structure. A join
    passes if either side carries a GlobalLimit / fixed-size sample /
    bounded-grain aggregate / registered bounded checkpoint (then output
    is O(n·S) with S fixed — ordinary SF-linear cost)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = []
    for n in _walk(plan):
        if n.nodeName() != "Join":
            continue
        cond = n.condition()
        s = cond.get().toString() if cond.isDefined() else ""
        # " = " catches equality conjuncts; "<=>" the null-safe form.
        # ("<=", ">=", "!=" render without a space before '=')
        if " = " in s or "<=>" in s:
            continue
        left = n.children().apply(0)
        right = n.children().apply(1)
        if _subtree_bounded(left) or _subtree_bounded(right):
            continue
        bad.append(
            ["unbounded-pair-join", n.joinType().toString(), s[:100]]
        )
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
        "broadcast_hint_offenders": broadcast_hint_offenders(df),
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
