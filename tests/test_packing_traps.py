"""Training-example prep (operators/packing.py) + frontier hygiene
(operators/traps.py, webmeta.anchor_topk): chunking covers every token
with the promised overlap, packing is a loss-free reordering of the
corpus token stream into exact seq_len windows, the salted anchor
top-k equals the plain-window oracle, and trap flags fire only on the
planted trap hosts."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ccr_web_crawler_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)
from ccr_web_crawler_spark.operators.traps import crawl_trap_report
from ccr_web_crawler_spark.operators.webmeta import anchor_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range((i * 13) % 41 + 1)))
        for i in range(60)
    ]
    rows += [(100, ""), (101, None), (102, "  one   two  ")]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- chunking


def test_chunks_cover_all_tokens_in_order(spark, docs):
    out = chunk_documents(docs, win=7, stride=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    src = {r["doc_id"]: (r["text"] or "").split() for r in docs.collect()}
    src = {k: [w.lower() for w in v] for k, v in src.items() if v}
    assert set(by_doc) == set(src)
    for did, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        toks = src[did]
        seen = set()
        for c in chunks:
            got = c["chunk"].split()
            s = c["start_tok"] - 1
            assert got == toks[s : s + 7]
            assert c["n_tokens"] == len(got)
            seen.update(range(s, s + len(got)))
        # stride(5) < win(7): every token position is covered
        assert seen == set(range(len(toks)))
        # starts advance by exactly the stride
        starts = [c["start_tok"] for c in chunks]
        assert starts == list(range(1, starts[-1] + 1, 5))


def test_chunk_short_doc_single_truncated(spark, docs):
    out = chunk_documents(docs, win=64, stride=48)
    row = out.filter(F.col("doc_id") == 102).collect()
    assert len(row) == 1
    assert row[0]["chunk"] == "one two"
    assert row[0]["n_tokens"] == 2
    # empty/null docs emit nothing
    assert out.filter(F.col("doc_id").isin(100, 101)).count() == 0


def test_chunk_rejects_bad_params(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, win=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, stride=-1)


# -------------------------------------------------------------- packing


@pytest.mark.parametrize("seq_len,parts", [(16, 5), (50, 3), (1000, 2)])
def test_pack_is_lossless_token_stream(spark, docs, seq_len, parts):
    out = pack_sequences(docs, seq_len=seq_len, num_partitions=parts).collect()
    out.sort(key=lambda r: r["seq_id"])
    # global reference stream: all tokens in doc_id order
    ref = []
    for r in sorted(docs.collect(), key=lambda r: r["doc_id"]):
        ref.extend((r["text"] or "").lower().split())
    got = []
    for i, r in enumerate(out):
        assert r["seq_id"] == i
        toks = r["text"].split()
        assert len(toks) == r["n_tokens"]
        if i < len(out) - 1:
            assert r["n_tokens"] == seq_len  # every non-final seq is full
        got.extend(toks)
    assert got == ref  # byte-level loss-free concat-and-chunk


def test_pack_doc_attribution_spans_boundaries(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h"), (3, "i j")],
        "doc_id long, text string",
    )
    out = {r["seq_id"]: r for r in pack_sequences(docs, seq_len=4).collect()}
    assert out[0]["doc_ids"] == "1" and out[0]["text"] == "a b c d"
    # doc 1's tail + doc 2's head + doc 3's head share sequence 1
    assert out[1]["doc_ids"] == "1,2" and out[1]["text"] == "e f g h"
    assert out[2]["doc_ids"] == "3" and out[2]["text"] == "i j"
    assert out[1]["n_docs"] == 2


# ------------------------------------------------------------- anchors


def test_anchor_topk_matches_plain_window(spark):
    rows = [
        (s, (s * 7 + 3) % 40, f"kw{(s + d) % 6}")
        for s in range(200)
        for d in [(s * 7 + 3) % 40, (s * 13 + 5) % 40]
    ]
    edges = spark.createDataFrame(rows, "src long, dst long, anchor string")
    got = sorted(
        anchor_topk(edges, k=3, n_salts=4)
        .select("dst", "anchor", "n_links", "rank")
        .collect()
    )
    c = edges.groupBy("dst", "anchor").agg(F.count("*").cast("long").alias("n_links"))
    w = Window.partitionBy("dst").orderBy(F.desc("n_links"), F.asc("anchor"))
    want = sorted(
        c.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .collect()
    )
    assert got == want


# --------------------------------------------------------------- traps


def test_trap_flags_only_planted_hosts(spark):
    urls = (
        [(f"https://ok.example/page/{i}?a=1",) for i in range(50)]
        + [(f"https://params.example/search?sid={i}",) for i in range(60)]
        + [("https://deep.example/" + "d/" * 15 + "x",)]
        + [("https://loop.example/a/b/a/b/a/b/p",)]
    )
    rep = {
        r["host"]: r
        for r in crawl_trap_report(
            spark.createDataFrame(urls, "url string"),
            max_urls_per_path=20.0, max_path_depth=12, max_segment_repeat=3,
        ).collect()
    }
    assert not rep["ok.example"]["is_trap"]
    assert rep["ok.example"]["urls_per_path"] == 1.0
    assert rep["params.example"]["is_trap"]
    assert rep["params.example"]["n_paths"] == 1
    assert rep["params.example"]["n_queries"] == 60
    assert rep["deep.example"]["is_trap"]
    assert rep["deep.example"]["max_depth"] == 16
    assert rep["loop.example"]["is_trap"]
    assert rep["loop.example"]["max_seg_repeat"] == 4
