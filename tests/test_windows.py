"""Windowed aggregates + range search, pinned against the SAME oracle
SQL the driver runs (__ray_entry__.oracle_sql() strings verbatim, on
views named like the driver's), so a pass here predicts a hash-green
CORRECTNESS row."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def _oracle_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "key",
    [
        "events_tumbling_window",
        "events_hopping_window",
        "events_top_users",
        "events_sessionize",
        "events_type_stats",
        "events_approx_distinct",
        "events_asof_join",
        "events_quantiles",
        "ann_range_search",
        "dedup_semantic",
        "text_vocab",
        "docs_sample_pct",
        "docs_sample_stratified",
        "tpch_pricing_summary",
        "tpch_order_revenue",
        "tpch_region_sales",
        "text_repetition",
        "docs_chunk_tokens",
        "text_tfidf_topk",
        "crawl_pagerank",
        "dedup_clusters",
        "events_funnel",
        "events_retention",
        "events_user_pivot",
        "docs_pack_greedy",
        "docs_curation",
        "crawl_host_stats",
        "emb_label_sums",
        "events_value_histogram",
        "events_type_transitions",
        "tpch_unshipped_orders",
        "docs_contamination",
    ],
)
def test_new_queries_match_their_oracles(ray_session, key):
    import __ray_entry__ as entry

    got = entry.queries()[key](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else pd.DataFrame(got)
    # pass SF explicitly: the data-derived oracles (IVF centroids,
    # LSH hyperplanes, semantic k-means) must be built on the SAME sf
    # dir the query runs on
    want = _oracle_con(SF).execute(entry.oracle_sql(SF)[key]).df()
    got, want = _normalize(got), _normalize(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) and len(got) > 0
    for c in got.columns:
        if got[c].dtype.kind in "iu":
            assert (got[c].to_numpy().astype("int64") == want[c].to_numpy().astype("int64")).all(), c
        else:
            assert (got[c].astype(str).to_numpy() == want[c].astype(str).to_numpy()).all(), c


def test_session_gap_semantics(ray_session):
    """Boundary pin: a gap EXACTLY equal to gap_s does NOT split (the
    split condition is strictly greater), and sessions never span
    users."""
    from polipus_ray.ops.windows import session_windows

    out = session_windows(SF, gap_s=14400).to_pandas()
    # session internals respect the gap: every session's span implies
    # per-event gaps <= gap (can't exceed (n-1) * gap)
    span = out["session_end_us"] - out["session_start_us"]
    assert (span <= (out["n_events"] - 1).clip(lower=0) * 14400 * 1_000_000).all()
    # total events conserved
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert int(out["n_events"].sum()) == n


def test_hll_accuracy_vs_exact(ray_session):
    """The sketch estimate lands within 5% of the exact distinct count
    (p=12 -> ~1.6% std error; 5% is >3 sigma)."""
    from polipus_ray.ops.windows import approx_distinct_users, event_type_stats

    est = approx_distinct_users(SF).to_pandas().set_index("event_type")["n_users_est"]
    exact = event_type_stats(SF).to_pandas().set_index("event_type")["n_users"]
    for t in exact.index:
        assert abs(int(est[t]) - int(exact[t])) <= max(2, 0.05 * int(exact[t])), (t, int(est[t]), int(exact[t]))


def test_hll_linear_counting_cross_engine_exact():
    """The ONLY float op the SQL oracle and numpy compute through
    different libraries is ln() in the linear-counting branch; its
    domain is the 4096 possible zero-register counts, so pin all of
    them: floor(4096 * ln(4096 / V)) must agree for every V."""
    import math

    vals = duckdb.sql("SELECT v, CAST(floor(4096.0 * ln(4096.0 / v)) AS BIGINT) AS e FROM range(1, 4097) t(v)").fetchall()
    for v, e in vals:
        assert e == int(math.floor(4096.0 * math.log(4096.0 / v))), v


def test_tumbling_window_conserves_events(ray_session):
    from polipus_ray.ops.windows import tumbling_window

    out = tumbling_window(SF, window_s=3600).to_pandas()
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert int(out["n_events"].sum()) == n
    assert (out["win_us"] % (3600 * 1_000_000) == 0).all()


def test_asof_join_edge_semantics(ray_session, tmp_path):
    """Crafted edges vs DuckDB ASOF JOIN on the same table: a view at
    EXACTLY the purchase ts (inclusive match), a purchase before any
    view (dropped, inner as-of), two views sharing the match ts (same
    match_ts either way), and interleaved users."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    US = 1_000_000
    rows = [
        # (event_id, ts_us, user_id, event_type)
        (1, 100 * US, 1, "view"),
        (2, 100 * US, 1, "purchase"),  # equal ts -> inclusive match
        (3, 50 * US, 2, "purchase"),  # before any view -> dropped
        (4, 60 * US, 2, "view"),
        (5, 70 * US, 2, "view"),
        (6, 70 * US, 2, "view"),  # duplicate match ts
        (7, 80 * US, 2, "purchase"),
        (8, 90 * US, 3, "purchase"),  # user with no views -> dropped
        (9, 105 * US, 1, "purchase"),  # second purchase, same match
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "sfedge"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    from polipus_ray.ops.windows import asof_join

    got = asof_join(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    import __ray_entry__ as entry

    want = con.execute(entry.oracle_sql()["events_asof_join"]).df()
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert list(got["event_id"]) == [2, 7, 9]  # 3 and 8 dropped
    for c in got.columns:
        assert (got[c].to_numpy().astype("int64") == want[c].to_numpy().astype("int64")).all(), c


def test_quantile_sieve_forced_rounds(ray_session):
    """Force the histogram sieve (cap far below per-type counts) and
    pin bit-exact agreement with DuckDB quantile_cont; the default
    path (cap > n, gather-all) is covered by the oracle-parity test."""
    from polipus_ray.ops.windows import quantiles_by_type

    got = quantiles_by_type(SF, qs=(0.5, 0.9, 0.99), bins=64, cap=20, max_rounds=8).to_pandas()
    want = (
        _oracle_con(SF)
        .execute(
            "SELECT event_type, quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.9) AS p90,"
            " quantile_cont(value, 0.99) AS p99 FROM events GROUP BY event_type ORDER BY event_type"
        )
        .df()
    )
    got = got.sort_values("event_type").reset_index(drop=True)
    assert list(got["event_type"]) == list(want["event_type"])
    for c in ("p50", "p90", "p99"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_quantile_lerp_matches_duckdb_bitexact():
    """The ONLY float arithmetic the quantile op shares with the SQL
    oracle is the final lerp s[lo]*(1-frac) + s[hi]*frac; fuzz-pin it
    bit-for-bit against quantile_cont across sizes and q."""
    import math

    import numpy as np

    con = duckdb.connect()
    for seed in range(4):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 5000))
        v = rng.standard_normal(n) * float(rng.uniform(0.1, 1000))
        con.execute("CREATE OR REPLACE TABLE t(x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(float(x),) for x in v])
        s = np.sort(v)
        for q in (0.5, 0.9, 0.99, 0.123, 0.007, 0.333):
            d = con.execute(f"SELECT quantile_cont(x, {q}) FROM t").fetchone()[0]
            r = (n - 1) * q
            lo = int(math.floor(r))
            frac = r - lo
            mine = s[lo] * (1 - frac) + s[min(lo + 1, n - 1)] * frac
            assert d == mine, (seed, n, q, d, mine)


def _write_events(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "sfevents"
    d.mkdir(exist_ok=True)
    pq.write_table(t, d / "events.parquet")
    return str(d)


def test_funnel_edge_semantics(ray_session, tmp_path):
    """Pins the greedy funnel edges: equal-timestamp step matches count
    (>= is inclusive), steps must be ordered (a click BEFORE the first
    view does not match), and the completion window is inclusive."""
    from polipus_ray.ops.windows import funnel_completions

    H = 3_600_000_000  # 1h in us
    rows = [
        # user 1: click before view -> click at t=5h after view matches
        (1, 2 * H, 1, "click", 0),
        (2, 3 * H, 1, "view", 0),
        (3, 5 * H, 1, "click", 0),
        (4, 6 * H, 1, "purchase", 0),
        # user 2: equal-ts chain view==click==purchase -> all match
        (5, 10 * H, 2, "view", 0),
        (6, 10 * H, 2, "click", 0),
        (7, 10 * H, 2, "purchase", 0),
        # user 3: completes exactly AT the window bound (inclusive)
        (8, 0 * H, 3, "view", 0),
        (9, 1 * H, 3, "click", 0),
        (10, 24 * H, 3, "purchase", 0),
        # user 4: missing middle step -> no row
        (11, 1 * H, 4, "view", 0),
        (12, 2 * H, 4, "purchase", 0),
    ]
    sf = _write_events(tmp_path, rows)
    out = funnel_completions(sf, steps=("view", "click", "purchase"), within_s=24 * 3600).to_pandas()
    got = {int(r.user_id): (int(r.t1_us), int(r.t2_us), int(r.t3_us)) for r in out.itertuples()}
    assert got == {
        1: (3 * H, 5 * H, 6 * H),
        2: (10 * H, 10 * H, 10 * H),
        3: (0, 1 * H, 24 * H),
    }


def test_retention_edge_semantics(ray_session, tmp_path):
    """A user active in weeks 0 and 1 is retained in week 0 but not in
    week 1 (no week-2 activity); duplicate events inside a week count
    once."""
    from polipus_ray.ops.windows import weekly_retention

    W = 7 * 86_400_000_000
    rows = [
        (1, 0, 1, "view", 0),
        (2, 1, 1, "view", 0),  # dup within week 0
        (3, W + 5, 1, "view", 0),  # week 1
        (4, 10, 2, "view", 0),  # week 0 only
    ]
    sf = _write_events(tmp_path, rows)
    out = weekly_retention(sf).to_pandas().set_index("week")
    assert int(out.loc[0, "n_active"]) == 2 and int(out.loc[0, "n_retained"]) == 1
    assert int(out.loc[1, "n_active"]) == 1 and int(out.loc[1, "n_retained"]) == 0


def test_retention_fine_buckets_beyond_2pow20(ray_session, tmp_path):
    """Second-granularity buckets over a multi-year span produce bucket
    indices >= 2^20; the packed (user, bucket) key must not collide
    across users (regression: fixed 2^20 multiplier)."""
    from polipus_ray.ops.windows import weekly_retention

    S = 1_000_000  # 1 s in us
    big = (1 << 21) * S  # bucket index 2^21 at bucket_s=1
    rows = [
        (1, 0 * S, 1, "view", 0),
        (2, 1 * S, 1, "view", 0),  # user 1 retained bucket 0 -> 1
        (3, big, 2, "view", 0),  # user 2 far bucket, NOT retained
        (4, big + 2 * S, 3, "view", 0),  # user 3, not adjacent to user 2
    ]
    sf = _write_events(tmp_path, rows)
    out = weekly_retention(sf, bucket_s=1).to_pandas().set_index("week")
    assert int(out.loc[0, "n_retained"]) == 1
    assert int(out.loc[1 << 21, "n_active"]) == 1 and int(out.loc[1 << 21, "n_retained"]) == 0
    assert int(out.loc[(1 << 21) + 2, "n_retained"]) == 0


def test_pack_greedy_boundaries(ray_session, tmp_path):
    """An exactly-full bin closes without spilling; an oversize doc
    occupies its own bin; group boundaries reset the fill."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from polipus_ray.ops.sample import pack_greedy

    def doc(n):  # text with exactly n space-split tokens
        return " ".join(["w"] * n)

    # group 0: 3 + 5 fills cap=8 exactly, next doc starts bin 1;
    # doc 3 is oversize (10 > 8) -> own bin; doc 32 is a new group
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 32], pa.int64()),
            "text": pa.array([doc(3), doc(5), doc(2), doc(10), doc(4)], pa.string()),
            "lang": pa.array(["en"] * 5, pa.string()),
            "source": pa.array(["t"] * 5, pa.string()),
            "n_chars": pa.array([1] * 5, pa.int64()),
        }
    )
    d = tmp_path / "sfdocs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = pack_greedy(str(d), capacity=8, group=32).to_pandas().set_index("doc_id")
    assert out.loc[0, "bin_id"] == 0 and out.loc[1, "bin_id"] == 0  # 3+5 == 8 fits
    assert out.loc[2, "bin_id"] == 1  # would overflow -> new bin
    assert out.loc[3, "bin_id"] == 2  # oversize -> own bin
    assert out.loc[32, "bin_id"] == 0 and out.loc[32, "pack_group"] == 1  # fresh group
