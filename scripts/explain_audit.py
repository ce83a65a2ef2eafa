"""Physical-plan audit: dump ``explain("formatted")`` for the headline
queries and assert the plan properties the 100TB design depends on —
filter/column pushdown into the parquet scan, broadcast only on
provably-small sides, whole-stage codegen on the hot path, no
unbounded cartesian products. Writes PLANS.md (plans + PASS/FAIL per
assertion) so the plan shape is reviewable without re-running Spark.

Usage: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# query name -> list of (description, predicate over the formatted plan)
CHECKS: dict[str, list[tuple[str, object]]] = {
    "tpch_q1": [
        ("filter pushed to parquet scan", lambda p: "PushedFilters: [" in p
         and re.search(r"PushedFilters: \[[^\]]*LessThanOrEqual", p)),
        ("column-pruned scan (no full-width ReadSchema)",
         lambda p: "ReadSchema" in p and "l_comment" not in p),
        ("hash aggregate with partial (map-side) pass",
         lambda p: p.count("HashAggregate") >= 2),
        ("whole-stage codegen on the agg path", lambda p: "codegen id :" in p),
    ],
    "revenue_by_nation": [
        ("small dims broadcast (no shuffle of nation/region)",
         lambda p: "BroadcastHashJoin" in p),
        ("big-side joins shuffle on keys, not nested-loop",
         lambda p: "BroadcastNestedLoopJoin" not in p
         and "CartesianProduct" not in p),
        ("partial aggregation before the exchange",
         lambda p: p.count("HashAggregate") >= 2),
    ],
    "seen_antijoin": [
        ("anti-join present (LeftAnti)", lambda p: "LeftAnti" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "exact_dedup_keep": [
        ("single shuffle on fingerprint (agg + join share the exchange or broadcast)",
         lambda p: "Exchange" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "knn_join": [
        ("query side broadcast (corpus never shuffles)",
         lambda p: "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p),
        ("corpus scan column-pruned to id+vector",
         lambda p: "ReadSchema" in p),
    ],
    "minhash_pairs": [
        ("band bucket join is a hash join, not cartesian",
         lambda p: "CartesianProduct" not in p),
        ("signature screen happens before shingle joins "
         "(est filter below the shingle join in the plan text)",
         lambda p: "est_jaccard" in p),
    ],
    "politeness_admit": [
        ("two-level window: salted first pass (host+salt partition key)",
         lambda p: re.search(r"Window.*(pmod|salt)", p, re.S) is not None
         or "pmod" in p),
        ("no single giant sort without partition keys",
         lambda p: "CartesianProduct" not in p),
    ],
    "textstats": [
        ("pure JVM expressions — no python UDF in the plan",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
        ("whole-stage codegen", lambda p: "codegen id :" in p),
        ("column-pruned scan", lambda p: "ReadSchema" in p),
    ],
    "corpus_clean": [
        ("pure JVM expressions — no python UDF in the plan",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
        ("quality/lang filters below the join (Filter under the probe side)",
         lambda p: "Filter" in p and "CartesianProduct" not in p),
        ("dedup is one window over the fingerprint exchange",
         lambda p: "Window" in p),
    ],
    "corpus_report": [
        ("pure JVM expressions — no python UDF in the plan",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
        ("partial (map-side) aggregation before the exchange",
         lambda p: p.count("HashAggregate") >= 2),
    ],
    "gopher_repetition": [
        ("higher-order funcs stay JVM-side — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
        ("column-pruned scan (only doc_id+text read)",
         lambda p: "ReadSchema" in p and "source" not in p.split("ReadSchema")[1][:200]),
        ("no shuffle at all — fused into the scan stage",
         lambda p: "Exchange" not in p),
    ],
    "token_budget_sample": [
        # the range exchange lives in the checkpointed subplan (lineage
        # pinned before the offsets were counted), so the visible plan
        # is the cut itself: distributed MapInPandas, never a
        # single-partition Window
        ("distributed prefix-sum cut (MapInPandas), no global Window",
         lambda p: "MapInPandas" in p and "Window" not in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "pii_scrub": [
        ("regexp algebra stays JVM-side — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
        ("map-only pass — no shuffle at all",
         lambda p: "Exchange" not in p),
        ("column-pruned scan (only doc_id+text read)",
         lambda p: "ReadSchema" in p and "source" not in p.split("ReadSchema")[1][:200]),
    ],
    "line_dedup": [
        ("boilerplate set joins as broadcast (high-df tail is tiny)",
         lambda p: "BroadcastHashJoin" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("line work stays JVM-side — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "pagerank": [
        # the 1-row scalar factors (n, dangling) legitimately enter as
        # broadcast nested loops; the per-edge contribution join must
        # be a hash join, and nothing may be an unbounded cartesian
        ("per-edge contribution join is a hash join",
         lambda p: "BroadcastHashJoin" in p or "ShuffledHashJoin" in p
         or "SortMergeJoin" in p),
        ("no unbounded cartesian product", lambda p: "CartesianProduct" not in p),
        ("iteration generations come from cache, not recompute",
         lambda p: "InMemoryTableScan" in p or "TableCacheQueryStage" in p),
    ],
    "dup_components": [
        ("label-propagation join is a hash join",
         lambda p: "BroadcastHashJoin" in p or "ShuffledHashJoin" in p
         or "SortMergeJoin" in p),
        ("no unbounded cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "asof_match": [
        ("one shuffle on the key + window carry-forward, no range join",
         lambda p: "Window" in p and "CartesianProduct" not in p
         and "BroadcastNestedLoopJoin" not in p),
        ("stays JVM-side — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "robots_parse": [
        ("map-only pass — no shuffle at all", lambda p: "Exchange" not in p),
        ("higher-order funcs stay JVM-side — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "sitemap_ingest": [
        ("map-only pass — no shuffle at all", lambda p: "Exchange" not in p),
        ("single generator explode, no python UDF",
         lambda p: "Generate" in p and "BatchEvalPython" not in p),
    ],
    "tfidf_topk": [
        ("partial (map-side) aggregation on the token explode",
         lambda p: p.count("HashAggregate") >= 2),
        ("no cartesian beyond the 1-row N factor",
         lambda p: "CartesianProduct" not in p),
        ("JVM end-to-end — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "context_assembly": [
        ("single aggregation keyed on query id (k-bounded groups)",
         lambda p: "HashAggregate" in p or "SortAggregate" in p or "ObjectHashAggregate" in p),
        ("no cartesian beyond the broadcast knn",
         lambda p: "CartesianProduct" not in p),
    ],
    "backlog_round": [
        ("per-host watermark (bound) joins as a broadcast, never a "
         "shuffle of the cold/new-link side on host",
         lambda p: "BroadcastHashJoin" in p),
        ("no cartesian product anywhere in the round",
         lambda p: "CartesianProduct" not in p),
        ("hot-capacity split is windowed per host (bounded sort keys), "
         "not a global sort",
         lambda p: "Window" in p),
        ("no sort-merge join anywhere — every join side in the round is "
         "either broadcast (watermarks, shortfall, robots) or window-"
         "co-partitioned",
         lambda p: "SortMergeJoin" not in p),
    ],
}


def build_backlog_round(spark, sf_dir):
    """The backlog-mode round's next_frontier plan: new links routed
    hot/cold against the broadcast per-host watermark, deferred rows
    competing for the per-host best-H slots (plans/round.py:436-489).
    IO-level boundedness (hot REPLACE <= hosts x H rows; cold strictly
    append-only) is asserted from manifest lineage in
    tests/test_backlog.py — this section pins the plan SHAPE."""
    from ccr_web_crawler_spark.plans.driver import crawl
    from ccr_web_crawler_spark.plans.round import RoundConfig, run_round
    from ccr_web_crawler_spark.sources.synth import synth_pages, synth_seeds
    from ccr_web_crawler_spark.sources.tableio import SnapshotStore
    import tempfile

    import pyspark.sql.functions as F

    tmp = tempfile.mkdtemp(prefix="backlog_plan_")
    pages = synth_pages(spark, n_pages=300, n_hosts=6)
    store = SnapshotStore(os.path.join(tmp, "st"))
    cfg = RoundConfig(extract=False, round_seconds=6.0, backlog_hot_rows=2,
                      seq_partitions=4)
    # run two real rounds so cold/bound exist, then build round 2's plan
    crawl(spark, pages, synth_seeds(spark), store, cfg, max_rounds=2)
    frontier = store.read(spark, "frontier")
    seen = store.read(spark, "seen")
    cold = store.read(spark, "frontier_cold")
    bound = store.read(spark, "frontier_bound")
    page_urls = pages.select(F.col("url").alias("url_canon"))
    res = run_round(spark, 2, frontier, seen, store.read(spark, "discovered"),
                    None, pages, None, cfg, page_urls=page_urls,
                    cold=cold, bound=bound)
    return res.next_frontier


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from ccr_web_crawler_spark.session import get_spark

    spark = get_spark(app_name="explain_audit", master="local[4]",
                      shuffle_partitions=8, task_cpus=1)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    lines = [
        "# PLANS — physical-plan audit (`scripts/explain_audit.py`)",
        "",
        f"Formatted plans at `{sf_dir}`, with the scale assertions each",
        "plan must satisfy. Regenerate: `python scripts/explain_audit.py`.",
        "",
    ]
    failures = 0
    for name, checks in CHECKS.items():
        if only and name not in only:
            continue
        if name == "backlog_round":
            df = build_backlog_round(spark, sf_dir)
        else:
            df = qs[name](spark, sf_dir)
        # execute the df's own plan once so AQE finalizes it (count()
        # would wrap a different plan tree) — formatted explain then
        # carries the real join strategies + codegen ids
        df.collect()
        plan = formatted_plan(df)
        lines.append(f"## {name}")
        lines.append("")
        for desc, pred in checks:
            ok = bool(pred(plan))
            failures += 0 if ok else 1
            mark = "PASS" if ok else "FAIL"
            lines.append(f"- **{mark}** {desc}")
            print(f"{name:24s} {mark}  {desc}")
        lines.append("")
        # assertions run on the FULL plan text above; the document keeps
        # a reviewable excerpt — iterative queries (pagerank, CC) carry
        # every persisted generation's lineage and explode to 10^5+
        # lines, which once ballooned PLANS.md to 77 MB
        plan_lines = plan.rstrip().splitlines()
        if len(plan_lines) > 400:
            plan_lines = plan_lines[:400] + [
                f"... [truncated: {len(plan_lines)} total lines; assertions "
                "evaluated on the full plan]"
            ]
        lines.append("```")
        lines.extend(plan_lines)
        lines.append("```")
        lines.append("")
    if only:
        # partial runs are for iterating on one plan — never clobber
        # the full audit document with a filtered subset
        print(f"\n(filtered run: PLANS.md not rewritten); {failures} failed assertions")
        spark.stop()
        sys.exit(1 if failures else 0)
    out = os.path.join(REPO, "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {out}; {failures} failed assertions")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
