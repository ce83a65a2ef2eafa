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
    "fetch_bucketed": [
        # the production fetch layout for rounds too big to broadcast:
        # the corpus is bucketed on url, so the join consumes its
        # bucketing — only the round-sized candidate side exchanges
        ("pages scan rides its bucketing (no corpus shuffle)",
         lambda p: "Bucketed: true" in p),
        # exactly 1 at driver scale (the candidate side shuffles to the
        # corpus bucketing); 0 at tiny scale when AQE broadcasts the
        # candidates instead — both keep the corpus unshuffled
        ("at most one hash exchange, never the corpus side",
         lambda p: p.count("Exchange hashpartitioning") <= 1),
        ("join is keyed, never nested-loop/cartesian",
         lambda p: "CartesianProduct" not in p
         and "BroadcastNestedLoopJoin" not in p),
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
    "lsh_ann": [
        # the 100TB shape: banded queries broadcast into the bucket
        # join; the corpus explodes bands map-side and never shuffles;
        # exact re-rank runs only inside candidate buckets
        ("band bucket join broadcasts the query side (corpus never shuffles)",
         lambda p: "BroadcastHashJoin" in p),
        ("no cartesian product anywhere (bucket join, not all-pairs)",
         lambda p: "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p),
        ("re-rank is a per-query window over candidates only",
         lambda p: "Window" in p),
        ("signatures via Arrow-batched pandas UDF (no row-at-a-time python)",
         lambda p: "ArrowEvalPython" in p and "BatchEvalPython" not in p),
    ],
    "ivf_ann": [
        ("probe join broadcasts the (query x nprobe) side on centroid_id",
         lambda p: "BroadcastHashJoin" in p),
        ("no cartesian product (cell-pruned candidates, not all-pairs)",
         lambda p: "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p),
        ("top-k is a per-query window over the probed cells only",
         lambda p: "Window" in p),
        ("centroid assignment via Arrow-batched pandas UDF",
         lambda p: "ArrowEvalPython" in p and "BatchEvalPython" not in p),
    ],
    "embedding_neardup": [
        # registered with use_lsh=False (the exact small-N oracle shape,
        # a self-join bounded by id<id) — the assertion pins that even
        # the exact path is a JOIN with the inequality applied, never an
        # unconditioned cartesian of the corpus against itself; the LSH
        # scale path's banded shape is pinned by the lsh_ann section +
        # tests/test_dedup.py
        ("pair generation is a join, not an unconditioned cartesian",
         lambda p: "CartesianProduct" not in p),
        ("cosine stays JVM-side (higher-order functions, no python UDF)",
         lambda p: "BatchEvalPython" not in p),
    ],
    "build_index": [
        ("embed UDF is Arrow-batched (iterator pandas UDF), not per-row python",
         lambda p: "ArrowEvalPython" in p and "BatchEvalPython" not in p),
        # dropDuplicates(url) compiles to a partial+final keyed
        # aggregate around ONE hash exchange on url (SortAggregate here
        # — the struct meta payload is not hash-aggregable; its sorts
        # are per-partition, keyed on url). What must NOT appear is a
        # range exchange (global sort).
        ("upsert-dedup is a keyed aggregate on url around a hash exchange "
         "(no global/range sort)",
         lambda p: ("Aggregate" in p) and "hashpartitioning" in p
         and "rangepartitioning" not in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "sessionize": [
        ("one exchange on the session key feeds both windows (gap lag + session id)",
         lambda p: "Window" in p and "CartesianProduct" not in p),
        ("JVM end-to-end — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
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
    "weighted_sample": [
        # A-Res priorities are map-side; the global top-k must run as
        # TakeOrdered (per-partition heaps + k-row driver merge), never
        # a full Sort+Exchange of the corpus
        ("global top-k runs as TakeOrdered, not a corpus sort",
         lambda p: "TakeOrderedAndProject" in p),
        ("priority math stays JVM-side — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "stratified_sample": [
        # skew-proof two-phase: phase 1 windows over (stratum, salt) so
        # a hot stratum splits across n_salts tasks; phase 2 re-ranks
        # the bounded survivors per stratum
        ("salted phase-1 window present (__salt in a window spec)",
         lambda p: "__salt" in p and p.count("Window") >= 2),
        ("rank filters applied below the final projection",
         lambda p: "row_number" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("hashing stays JVM-side — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "revisit_schedule": [
        ("one host-partitioned window, no global sort",
         lambda p: "Window" in p and "TakeOrderedAndProject" not in p),
        ("no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "wet_ingest": [
        # record parse = regexp/substr fused into the delimiter-text
        # scan: map-only, JVM-side end-to-end
        ("parse stays JVM-side — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
        ("map-only parse — no shuffle between scan and project",
         lambda p: "Exchange" not in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "warc_ingest": [
        # raw WARC = Content-Length-framed binary records: file-level
        # parallelism, streamed through one Arrow-batched mapInPandas
        ("record parse is a streaming MapInPandas (binary framing needs "
         "byte-level IO), never row-at-a-time python",
         lambda p: "BatchEvalPython" not in p and "MapInPandas" in p),
        ("only exchange is the round-robin file-to-task spread — parsed "
         "record data never hash/range-shuffles",
         lambda p: "Exchange hashpartitioning" not in p
         and "Exchange rangepartitioning" not in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "politeness_lag": [
        ("lag check rides the per-host window — no global window",
         lambda p: "Window" in p),
        ("partial aggregation before the exchange",
         lambda p: p.count("HashAggregate") >= 2),
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
        # since round 4 each generation's lineage is CUT with a
        # checkpoint (operators/graph.py:_next_gen) — the returned plan
        # must be a leaf scan of the final generation's blocks, NOT an
        # exponentially-nested join tree (the round-3 plan embedded the
        # whole iteration history and its stringification alone burned
        # minutes of driver CPU). The per-iteration join shapes are
        # audited separately in pagerank_step below.
        ("final generation is a checkpoint-leaf scan (lineage cut)",
         lambda p: "Scan ExistingRDD" in p),
        ("no exponential plan tree (single-page plan text)",
         lambda p: len(p.splitlines()) < 60),
        ("no unbounded cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "pagerank_step": [
        # the 1-row scalar factors (n, dangling) legitimately enter as
        # broadcast nested loops; the per-edge contribution join must
        # be a hash join, and nothing may be an unbounded cartesian
        ("per-edge contribution join is a hash join",
         lambda p: "BroadcastHashJoin" in p or "ShuffledHashJoin" in p
         or "SortMergeJoin" in p),
        ("previous generation read from its checkpoint leaf, not recomputed",
         lambda p: "Scan ExistingRDD" in p),
        ("no unbounded cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "dup_components": [
        ("final labels are a checkpoint-leaf scan (lineage cut)",
         lambda p: "Scan ExistingRDD" in p),
        ("no exponential plan tree (single-page plan text)",
         lambda p: len(p.splitlines()) < 60),
        ("no unbounded cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "cc_step": [
        ("label-propagation join is a hash join",
         lambda p: "BroadcastHashJoin" in p or "ShuffledHashJoin" in p
         or "SortMergeJoin" in p),
        ("previous generation read from its checkpoint leaf, not recomputed",
         lambda p: "Scan ExistingRDD" in p),
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
    "url_filter": [
        ("blocklist suffix match is an equi-join (never LIKE nested-loop)",
         lambda p: "CartesianProduct" not in p
         and "BroadcastNestedLoopJoin" not in p),
        ("blocked urls removed by anti-join on the url key alone",
         lambda p: "LeftAnti" in p),
        ("word score is pure JVM — no python UDF in the scoring path",
         lambda p: "BatchEvalPython" not in p),
    ],
    "substring_spans": [
        ("chunk-pair candidates come from a hash equi-join on chunk_fp, "
         "never all-pairs",
         lambda p: "CartesianProduct" not in p
         and "BroadcastNestedLoopJoin" not in p),
        ("chunk TEXT never crosses the shuffle — only (id, pos, len, fp) "
         "columns appear in the exchange",
         lambda p: all("txt" not in ln for ln in p.splitlines()
                       if "Exchange" in ln)),
        ("CDC hashing is JVM higher-order functions — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "decontaminate": [
        ("benchmark gram set joins as an equi-join on the gram hash "
         "(AQE may broadcast; no cartesian / nested loop)",
         lambda p: "CartesianProduct" not in p
         and "BroadcastNestedLoopJoin" not in p),
        ("per-doc hit counts use partial (map-side) aggregation",
         lambda p: p.count("HashAggregate") >= 2),
        ("gram hashing is JVM higher-order functions — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
    ],
    "doc_chunks": [
        ("chunking is map-only: no Exchange anywhere in the plan",
         lambda p: "Exchange" not in p),
        ("pure JVM higher-order functions — no python UDF",
         lambda p: "BatchEvalPython" not in p and "ArrowEvalPython" not in p),
        ("corpus scan column-pruned to id+text",
         lambda p: "ReadSchema" in p and "source" not in p.split("ReadSchema")[1][:200]),
    ],
    "pack_sequences": [
        # the scale-critical property: the global token prefix sum is
        # the two-phase form — a range exchange + per-partition window,
        # NEVER a single-partition global window (Exchange SinglePartition)
        ("no single-partition global window",
         lambda p: "Exchange SinglePartition" not in p),
        # the range exchange itself sits above an eager localCheckpoint
        # (layout pinned before the per-partition sums are collected),
        # so the final plan starts at the checkpoint scan; what must
        # show here is the PARTITION-LOCAL window keyed on __pid
        ("prefix-sum window is per-partition (__pid), not global",
         lambda p: "__pid" in p and "Window" in p),
        ("sequence reassembly is a hash aggregate, not a sort of the corpus",
         lambda p: "HashAggregate" in p or "ObjectHashAggregate" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "anchor_topk": [
        ("anchor counting has a partial (map-side) aggregation pass",
         lambda p: p.count("HashAggregate") >= 2),
        ("two window phases: salted local top-k then per-dst re-rank",
         lambda p: p.count("Window") >= 2),
        # the input builder derives edges off a 1-row corpus-count
        # scalar crossJoin (same pattern as the pagerank graph; it
        # appears once per union branch). Those are allowed — but they
        # must all be the broadcast-a-tiny-side Cross BuildRight form,
        # and the top-k path itself must stay free of real cartesians
        ("no cartesian product; nested loops only as scalar Cross BuildRight",
         lambda p: "CartesianProduct" not in p
         and all(
             "Cross BuildRight" in ln
             or re.match(r"\(\d+\) BroadcastNestedLoopJoin", ln)
             for ln in p.splitlines() if "BroadcastNestedLoopJoin" in ln
         )),
    ],
    "trap_report": [
        ("URL parse + per-host stats partial-aggregate before ONE exchange",
         lambda p: p.count("HashAggregate") >= 2),
        # the wrapper canonicalizes input URLs with the Arrow-batched
        # canonicalize UDF; the operator's own parse path is pure JVM —
        # what must never appear is a row-at-a-time python UDF
        ("no row-at-a-time python UDF in the parse path",
         lambda p: "BatchEvalPython" not in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
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


def build_pagerank_step(spark, sf_dir):
    """One un-checkpointed PageRank iteration over a checkpoint-leaf
    previous generation — the per-iteration shape pagerank's final
    (lineage-cut) plan no longer shows."""
    import pyspark.sql.functions as F

    from ccr_web_crawler_spark.operators.graph import (
        _next_gen,
        _nodes_of,
        _pagerank_step,
    )

    edges = spark.createDataFrame(
        [(i, (i * 7) % 100) for i in range(400)], "src long, dst long"
    )
    e = edges.select("src", "dst").distinct()
    nodes = _nodes_of(e, "src", "dst")
    n1 = nodes.agg(F.count("*").cast("double").alias("n"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    ranks = _next_gen(
        nodes.crossJoin(n1).select("id", (F.lit(1.0) / F.col("n")).alias("r"))
    )
    return _pagerank_step(e, nodes, outdeg, n1, ranks, 0.85)


def build_cc_step(spark, sf_dir):
    """One un-checkpointed hash-min propagation round (see
    build_pagerank_step)."""
    import pyspark.sql.functions as F

    from ccr_web_crawler_spark.operators.graph import _cc_step, _next_gen, _nodes_of

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "src long, dst long"
    )
    fwd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    und = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    labels = _next_gen(_nodes_of(und, "a", "b").select("id", F.col("id").alias("label")))
    return _cc_step(und, labels)


_BUILDERS = {
    "backlog_round": lambda spark, sf: build_backlog_round(spark, sf),
    "pagerank_step": build_pagerank_step,
    "cc_step": build_cc_step,
}


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
    qs = entrymod.queries_all()
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
        if name in _BUILDERS:
            df = _BUILDERS[name](spark, sf_dir)
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
