"""Hot/cold frontier backlog (RoundConfig.backlog_hot_rows): bounded
per-round frontier IO with bit-identical crawl semantics.

The monolithic frontier re-shuffles (dedupe groupBy) and rewrites
(REPLACE commit) the ENTIRE backlog every round even when politeness
admits a sliver — O(frontier) work per round, the crawl loop's true
100x-scale cost ceiling. Backlog mode keeps only the per-host best H
rows hot; overflow lives in an append-only cold table consumed via a
per-host (depth, seq) watermark (a logical delete — never a rewrite).
These tests pin (1) exact equivalence with the monolithic engine,
(2) the bounded-IO claim on the committed files themselves, (3) resume,
(4) compaction."""

import pytest
from pyspark.sql import functions as F

from ccr_web_crawler_spark.plans.driver import compact_cold, crawl
from ccr_web_crawler_spark.plans.round import RoundConfig
from ccr_web_crawler_spark.sources.synth import synth_pages, synth_robots, synth_seeds
from ccr_web_crawler_spark.sources.tableio import SnapshotStore

N_PAGES, N_HOSTS = 400, 4
# budget = floor(6 / 1.5) = 4 urls/host/round -> heavy deferral; H = 6
# per host forces demotions AND refills on this graph
CFG = dict(round_seconds=6.0, seq_partitions=4)


def _sorted_rows(spark, store, table, cols=None):
    df = store.read(spark, table)
    if df is None:
        return []
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())


def _discovered_order(spark, store):
    """Discovered docs as an ORDERED url list. seq VALUES are mode-
    specific (both accountings over-count deferred rows differently and
    gaps are documented as non-semantic); the crawl ORDER they induce is
    the reference semantics and must be identical."""
    df = store.read(spark, "discovered")
    if df is None:
        return []
    return [(r.url_canon, r.depth) for r in df.orderBy("seq").collect()]


def _run(spark, tmp_path, name, **cfg_kw):
    store = SnapshotStore(tmp_path / name)
    pages = synth_pages(spark, N_PAGES, N_HOSTS).localCheckpoint(eager=True)
    robots = synth_robots(spark, N_HOSTS)
    s = crawl(
        spark, pages, synth_seeds(spark), store,
        RoundConfig(**{**CFG, **cfg_kw}), robots,
    )
    return store, s


def test_backlog_equivalent_to_monolithic(spark, tmp_path):
    mono_store, mono = _run(spark, tmp_path, "mono")
    back_store, back = _run(spark, tmp_path, "back", backlog_hot_rows=6)

    # the experiment is only meaningful if the backlog actually engaged
    assert back_store.count("frontier_cold") > 0, "no demotion happened"

    # identical final state: visited set, discovered docs (incl. crawl
    # order via seq), extracted sections
    for table, cols in [
        ("seen", ["url_canon", "first_round"]),
        ("extracted", ["url", "guid", "extraction_status", "text_plain"]),
    ]:
        assert _sorted_rows(spark, mono_store, table, cols) == _sorted_rows(
            spark, back_store, table, cols
        ), f"{table} diverged"
    # crawl ORDER equivalence (seq values are accounting-specific)
    assert _discovered_order(spark, mono_store) == _discovered_order(
        spark, back_store
    ), "discovered ordering diverged"

    # identical round-by-round admission (metrics minus wall time)
    # frontier_size (r[2]) intentionally differs: backlog mode commits
    # only the bounded hot set; wall_ms (r[5]) is nondeterministic.
    # Backlog mode may end with ONE extra sterile round: the loop guard
    # uses cold's physical count (which over-counts consumed rows), so
    # proving "cold fully consumed" costs one admit-nothing round — a
    # cheap no-op, not an admission divergence.
    strip = lambda rows: [  # noqa: E731
        (r[0], r[1], r[3], r[4])
        for r in rows
        if (r[1], r[3], r[4]) != (0, 0, 0)
    ]
    assert strip(mono.metrics) == strip(back.metrics)
    assert back.queue_remaining == 0


def test_backlog_bounds_hot_frontier_and_never_rewrites_cold(spark, tmp_path):
    # H ABOVE the max per-host budget (6): early rounds overflow hot
    # (demotion pressure), late rounds — small pools — must run without
    # touching cold at all, which is the bounded-IO claim
    H = 12
    store, _ = _run(spark, tmp_path, "io", backlog_hot_rows=H)
    history = [
        m for m in store.history() if m["metrics"].get("phase") == "round"
    ]
    assert len(history) >= 4
    cold_prev: list = []
    saw_quiet_cold_round = False
    for m in history:
        # hot REPLACE is bounded by hosts x H every single round
        hot_rows = sum(
            v["rows"] for v in m["tables"]["frontier"]["lineage"].values()
        )
        assert hot_rows <= N_HOSTS * H, f"hot frontier unbounded: {hot_rows}"
        # cold is append-only: earlier files never disappear or change
        cold_files = (m["tables"].get("frontier_cold") or {}).get("files", [])
        assert cold_files[: len(cold_prev)] == cold_prev, "cold rewritten"
        if cold_files == cold_prev and cold_prev:
            saw_quiet_cold_round = True
        cold_prev = cold_files
    assert saw_quiet_cold_round, "every round touched cold — split inert"


def test_backlog_hot_frontier_is_per_host_best(spark, tmp_path):
    store, _ = _run(spark, tmp_path, "inv", backlog_hot_rows=6, round_seconds=3.0)
    # invariant mid-history: every committed hot row sorts strictly
    # before the host's cold watermark (hot < bound <= live cold)
    for m in store.history():
        if m["metrics"].get("phase") != "round":
            continue
        v = m["version"]
        hot = store.read(spark, "frontier", v)
        bound = store.read(spark, "frontier_bound", v)
        if hot is None or bound is None:
            continue
        bad = (
            hot.join(bound, "host")
            .filter(
                F.struct("depth", "seq")
                >= F.struct(F.col("b_depth"), F.col("b_seq"))
            )
            .count()
        )
        assert bad == 0, f"hot row at/past the cold watermark in v{v}"


def test_backlog_resume_identical(spark, tmp_path):
    full_store, _ = _run(spark, tmp_path, "full", backlog_hot_rows=6)
    part_store = SnapshotStore(tmp_path / "part")
    pages = synth_pages(spark, N_PAGES, N_HOSTS).localCheckpoint(eager=True)
    robots = synth_robots(spark, N_HOSTS)
    cfg = RoundConfig(**CFG, backlog_hot_rows=6)
    crawl(spark, pages, synth_seeds(spark), part_store, cfg, robots, max_rounds=3)
    crawl(spark, pages, synth_seeds(spark), part_store, cfg, robots)  # resume
    for table in ("seen", "discovered", "extracted"):
        cols = {"seen": ["url_canon", "first_round"], "extracted": ["url", "guid"]}.get(table)
        assert _sorted_rows(spark, full_store, table, cols) == _sorted_rows(
            spark, part_store, table, cols
        ), f"{table} diverged after resume"


def test_compact_cold_drops_consumed_rows_only(spark, tmp_path):
    store, summary = _run(spark, tmp_path, "compact", backlog_hot_rows=6)
    assert summary.cold_backlog > 0
    before = _sorted_rows(spark, store, "seen")
    kept = compact_cold(spark, store)
    # a drained crawl's cold table is all consumed -> compaction empties it
    assert kept == 0
    # compaction must not disturb crawl state, and a resumed crawl over
    # the compacted store stays drained
    pages = synth_pages(spark, N_PAGES, N_HOSTS).localCheckpoint(eager=True)
    s2 = crawl(
        spark, pages, synth_seeds(spark), store,
        RoundConfig(**CFG, backlog_hot_rows=6), synth_robots(spark, N_HOSTS),
    )
    assert s2.rounds == 0
    assert _sorted_rows(spark, store, "seen") == before


@pytest.mark.parametrize("h", [1, 3])
def test_backlog_tiny_hot_capacity_still_equivalent(spark, tmp_path, h):
    """H below the per-host budget (4) must cost refills, not
    correctness: the refill clamps promotion to the budget."""
    mono_store, mono = _run(spark, tmp_path, f"m{h}")
    back_store, back = _run(spark, tmp_path, f"b{h}", backlog_hot_rows=h)
    assert _sorted_rows(spark, mono_store, "seen") == _sorted_rows(
        spark, back_store, "seen"
    )
    # frontier_size (r[2]) intentionally differs: backlog mode commits
    # only the bounded hot set; wall_ms (r[5]) is nondeterministic;
    # trailing sterile rounds are a documented no-op (see above)
    strip = lambda rows: [  # noqa: E731
        (r[0], r[1], r[3], r[4])
        for r in rows
        if (r[1], r[3], r[4]) != (0, 0, 0)
    ]
    assert strip(mono.metrics) == strip(back.metrics)


def test_non_backlog_resume_of_backlog_store_refuses(spark, tmp_path):
    """Resuming a backlog-written store without backlog mode would
    strand the cold URLs — the driver must refuse loudly."""
    import pytest

    from ccr_web_crawler_spark.plans.driver import crawl
    from ccr_web_crawler_spark.plans.round import RoundConfig
    from ccr_web_crawler_spark.sources.synth import synth_pages, synth_seeds
    from ccr_web_crawler_spark.sources.tableio import SnapshotStore

    pages = synth_pages(spark, n_pages=N_PAGES, n_hosts=N_HOSTS)
    store = SnapshotStore(str(tmp_path / "mixed"))
    crawl(
        spark, pages, synth_seeds(spark), store,
        RoundConfig(extract=False, round_seconds=6.0, backlog_hot_rows=2,
                    seq_partitions=4),
        max_rounds=2,
    )
    assert store.count("frontier_cold") > 0, "fixture must leave a backlog"
    with pytest.raises(ValueError, match="backlog"):
        crawl(
            spark, pages, synth_seeds(spark), store,
            RoundConfig(extract=False, round_seconds=6.0, seq_partitions=4),
            max_rounds=1,
        )
