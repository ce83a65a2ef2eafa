"""As-of join (operators/temporal.py) + robots/sitemap parsing
(operators/webmeta.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from ccr_web_crawler_spark.operators.temporal import asof_join
from ccr_web_crawler_spark.operators.webmeta import parse_robots, sitemap_urls


def _t(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic_and_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _t("2024-01-01T10:00:00")),  # before any snapshot
            (2, "u", _t("2024-01-01T12:00:00")),  # exactly AT snapshot a
            (3, "u", _t("2024-01-01T13:00:00")),  # between a and b
            (4, "u", _t("2024-01-02T00:00:00")),  # after b
            (5, "v", _t("2024-01-01T12:30:00")),  # other key, no snapshots
        ],
        "id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _t("2024-01-01T12:00:00"), "a"),
            ("u", _t("2024-01-01T14:00:00"), "b"),
        ],
        "user string, ts timestamp, tag string",
    )
    out = {r["id"]: r for r in asof_join(left, right, on="user").collect()}
    assert out[1]["r_tag"] is None and out[1]["r_ts"] is None
    assert out[2]["r_tag"] == "a"  # inclusive: snapshot AT the instant matches
    assert out[3]["r_tag"] == "a"
    assert out[4]["r_tag"] == "b"
    assert out[5]["r_tag"] is None
    # inner drops the unmatched rows, keeps the rest identical
    inner = asof_join(left, right, on="user", how="inner").collect()
    assert sorted(r["id"] for r in inner) == [2, 3, 4]


def test_asof_join_keeps_left_columns(spark):
    left = spark.createDataFrame(
        [(1, "u", _t("2024-01-01T13:00:00"), 9.5)],
        "id long, user string, ts timestamp, score double",
    )
    right = spark.createDataFrame(
        [("u", _t("2024-01-01T12:00:00"), 3)], "user string, ts timestamp, n long"
    )
    row = asof_join(left, right, on="user").collect()[0]
    assert (row["id"], row["user"], row["score"], row["r_n"]) == (1, "u", 9.5, 3)


def test_asof_join_tie_is_deterministic_across_partitionings(spark):
    """Several right rows at the SAME (key, ts): the matched payload
    must not depend on shuffle order — the content-hash tiebreak picks
    one stable winner however the right side is partitioned."""
    left = spark.createDataFrame(
        [(1, "u", _t("2024-01-01T13:00:00"))], "id long, user string, ts timestamp"
    )
    rows = [("u", _t("2024-01-01T12:00:00"), tag) for tag in
            ["alpha", "bravo", "charlie", "delta", "echo"]]
    right = spark.createDataFrame(rows, "user string, ts timestamp, tag string")
    winners = set()
    for shaped in (right.coalesce(1), right.repartition(7),
                   right.repartition(3, "tag"),
                   right.orderBy(F.desc("tag")), right.orderBy("tag")):
        got = asof_join(left, shaped, on="user").collect()
        assert len(got) == 1
        winners.add(got[0]["r_tag"])
    assert len(winners) == 1, winners


ROBOTS = """User-agent: googlebot
Disallow: /google-only

User-agent: *
Disallow: /private
Crawl-delay: 2.5
Disallow:
Disallow: /tmp/

User-agent: bing
Disallow: /bing-only"""


def test_parse_robots_star_block(spark):
    df = spark.createDataFrame([("h", ROBOTS)], "host string, robots_txt string")
    row = parse_robots(df).collect()[0]
    assert row["disallow_prefixes"] == ["/private", "/tmp/"]  # file order, empty skipped
    assert row["crawl_delay"] == 2.5


def test_parse_robots_edge_shapes(spark):
    df = spark.createDataFrame(
        [
            ("no_star", "User-agent: googlebot\nDisallow: /x"),
            ("bare_star", "User-agent: *"),
            ("compact", "user-agent:*\ndisallow: /z"),
            ("empty", ""),
            ("null", None),
        ],
        "host string, robots_txt string",
    )
    out = {r["host"]: r for r in parse_robots(df).collect()}
    assert out["no_star"]["disallow_prefixes"] == [] and out["no_star"]["crawl_delay"] is None
    assert out["bare_star"]["disallow_prefixes"] == []
    assert out["compact"]["disallow_prefixes"] == ["/z"]
    assert out["empty"]["disallow_prefixes"] == []
    assert out["null"]["disallow_prefixes"] == []


def test_parse_robots_preserves_value_case(spark):
    """Directive names match case-insensitively but path VALUES keep
    their original case (RFC 9309 §2.2.2) — 'Disallow: /Admin' must
    block '/Admin' in the case-sensitive politeness filter."""
    from ccr_web_crawler_spark.operators.politeness import apply_robots

    txt = "User-Agent: *\nDISALLOW: /Admin\ndisallow: /Data/Raw\nCRAWL-DELAY: 2"
    df = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    robots = parse_robots(df)
    row = robots.collect()[0]
    assert row["disallow_prefixes"] == ["/Admin", "/Data/Raw"]
    assert row["crawl_delay"] == 2.0
    frontier = spark.createDataFrame(
        [
            ("h", "https://h/Admin/x"),   # blocked (exact case)
            ("h", "https://h/admin/x"),   # NOT blocked (different case)
            ("h", "https://h/Data/Raw"),  # blocked
            ("h", "https://h/ok"),
        ],
        "host string, url_canon string",
    )
    kept = sorted(r["url_canon"] for r in apply_robots(frontier, robots).collect())
    assert kept == ["https://h/admin/x", "https://h/ok"]


def test_sitemap_urls_extracts_in_order(spark):
    xml = (
        "<urlset><url><loc> https://h/a </loc></url>"
        "<url><loc>https://h/b</loc></url><url><loc>https://h/c</loc></url></urlset>"
    )
    df = spark.createDataFrame([("h", xml), ("empty", "<urlset></urlset>")],
                               "host string, xml string")
    rows = sitemap_urls(df).orderBy("host", "pos").collect()
    assert [(r["host"], r["pos"], r["url"]) for r in rows] == [
        ("h", 1, "https://h/a"), ("h", 2, "https://h/b"), ("h", 3, "https://h/c"),
    ]


def _reference_parse(text):
    """Sequential reference parser (the obvious 15-line loop) for the
    same robots subset — pins the distributed HOF state machine."""
    prefixes, delay, in_star, seen_star = [], None, False, False
    for raw in (text or "").split("\n"):
        stripped = raw.strip()
        ln = stripped.lower()  # directive matching is case-insensitive ...
        if ln.startswith("user-agent"):
            head, _, agent = ln.partition(":")
            if head.rstrip() == "user-agent":
                in_star = (not seen_star) and agent.strip() == "*"
                seen_star = seen_star or in_star
        elif in_star:
            head, colon, _ = ln.partition(":")
            head = head.rstrip()
            # ... but the VALUE keeps its original case (path prefixes
            # are case-sensitive, RFC 9309 §2.2.2)
            val = stripped.partition(":")[2].strip()
            if colon and head == "disallow" and val:
                prefixes.append(val)
            elif colon and head == "crawl-delay" and delay is None:
                try:
                    delay = float(val)
                except ValueError:
                    delay = None
    return prefixes, delay


def test_parse_robots_matches_reference_parser(spark):
    import random

    rng = random.Random(42)
    agents = ["*", "googlebot", "bing", "*"]
    directives = ["Disallow: /a", "disallow: /b/c", "Disallow:", "Crawl-delay: 3",
                  "crawl-delay: 0.5", "Allow: /ok", "# comment", "",
                  "Disallow: /Admin/Panel", "DISALLOW: /CaseTest"]
    files = []
    for i in range(40):
        lines = []
        for _ in range(rng.randrange(0, 12)):
            if rng.random() < 0.3:
                sp = " " * rng.randrange(0, 3)
                lines.append(f"User-agent{sp}:{sp}{rng.choice(agents)}")
            else:
                lines.append(rng.choice(directives))
        files.append((f"h{i}", "\n".join(lines)))
    df = spark.createDataFrame(files, "host string, robots_txt string")
    got = {r["host"]: r for r in parse_robots(df).collect()}
    for host, text in files:
        want_prefixes, want_delay = _reference_parse(text)
        assert got[host]["disallow_prefixes"] == want_prefixes, (host, text)
        assert got[host]["crawl_delay"] == want_delay, (host, text)


def test_asof_join_matches_pandas_merge_asof(spark):
    import pandas as pd
    import random

    rng = random.Random(7)
    left = [(i, f"k{rng.randrange(4)}", _t("2024-01-01T00:00:00").timestamp()
             + rng.randrange(0, 100000)) for i in range(120)]
    rights = sorted({(f"k{rng.randrange(4)}",
                      _t("2024-01-01T00:00:00").timestamp() + rng.randrange(0, 100000),
                      j) for j in range(25)})
    lpdf = pd.DataFrame(left, columns=["id", "k", "sec"])
    lpdf["ts"] = pd.to_datetime(lpdf["sec"], unit="s")
    rpdf = pd.DataFrame(rights, columns=["k", "sec", "tag"])
    rpdf["ts"] = pd.to_datetime(rpdf["sec"], unit="s")
    want = pd.merge_asof(
        lpdf.sort_values("ts"), rpdf[["k", "ts", "tag"]].sort_values("ts"),
        on="ts", by="k", direction="backward",
    ).set_index("id")["tag"]
    ldf = spark.createDataFrame(lpdf[["id", "k", "ts"]])
    rdf = spark.createDataFrame(rpdf[["k", "ts", "tag"]])
    got = {r["id"]: r["r_tag"] for r in asof_join(ldf, rdf, on="k").collect()}
    for i in want.index:
        w = want[i]
        assert got[i] == (None if pd.isna(w) else w), i


def test_parse_robots_feeds_politeness_schema(spark):
    """The parsed table plugs straight into operators/politeness
    (same column names/types the robots_filter query consumes)."""
    df = spark.createDataFrame([("h", ROBOTS)], "host string, robots_txt string")
    out = parse_robots(df)
    assert dict(out.dtypes) == {
        "host": "string",
        "disallow_prefixes": "array<string>",
        "crawl_delay": "double",
    }
