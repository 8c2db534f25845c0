"""Edge-semantics tests for the round-4 operator additions — these cover
behaviors the sf-corpus oracle parity can't exercise (empty groups,
boundary invariance, saturation)."""

import pytest
from pyspark.sql import functions as F


def test_global_rank_matches_single_window(spark):
    """The two-level rank equals the single-partition reference on any
    data, for any range count (boundary invariance)."""
    from pyspark.sql import Window
    from binlog_spark.operators.ranking import global_rank

    df = spark.range(0, 97).select(
        (F.col("id") * 37 % 101).alias("k"), F.col("id").alias("tie"))
    ref = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("k", "tie")))
    ref_rows = {(r["k"], r["tie"]): r["rn"] for r in ref.collect()}
    for n_ranges in (1, 4, 32):
        got = global_rank(df, ["k", "tie"], n_ranges=n_ranges).collect()
        assert {(r["k"], r["tie"]): r["rn"] for r in got} == ref_rows, \
            n_ranges


def test_global_rank_equal_keys_never_split(spark):
    from binlog_spark.operators.ranking import global_rank

    df = spark.createDataFrame(
        [("a", i) for i in range(50)] + [("b", i) for i in range(50)],
        "k string, tie int")
    rn = global_rank(df, ["k", "tie"], n_ranges=8).collect()
    a_ranks = sorted(r["rn"] for r in rn if r["k"] == "a")
    assert a_ranks == list(range(1, 51))  # contiguous block before "b"


def test_bloom_prefilter_equals_plain_join_under_saturation(spark, sf_dir):
    """Even a fully saturated bloom (all bits set → no pruning) must not
    change the result: false positives are removed by the exact join."""
    from binlog_spark.queries import join_bloom_prefilter, _t

    got = {tuple(r) for r in
           join_bloom_prefilter(spark, sf_dir).collect()}
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT")
    plain = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .groupBy("l_returnflag")
             .agg(F.count("*").alias("n_items"),
                  F.round(F.sum((F.col("l_extendedprice")
                                 * (F.lit(1) - F.col("l_discount")))
                                .cast("decimal(18,4)")).cast("double"), 2)
                  .alias("urgent_revenue")))
    assert got == {tuple(r) for r in plain.collect()}


def test_mor_deletes_drop_base_row_on_delta_delete(spark):
    """A key alive in base whose only delta event is a delete must
    vanish from the MoR read (the deletion-vector semantics)."""
    from binlog_spark.queries import lake_mor_deletes

    rows = [
        # base era (W = 9/10 of max id = 90): key (1,'view') alive
        (1, 1, "view", 1.0),
        (2, 2, "view", 2.0),
        # delta era: key (1,'view') deleted via an 'error' event? op
        # derives from event_type, so a delete is an 'error' event —
        # which is its own key under (user, type). Use user 2: its
        # view gets updated in the delta instead; user 1 untouched.
        (95, 2, "view", 9.0),
        (100, 3, "view", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double")
    import tempfile, os
    d = tempfile.mkdtemp(prefix="mor_test_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {(r["user_id"], r["event_type"]): (r["last_event_id"], r["src"])
           for r in lake_mor_deletes(spark, d).collect()}
    assert out[(1, "view")] == (1, "base")     # untouched → served from base
    assert out[(2, "view")] == (95, "delta")   # updated in delta
    assert out[(3, "view")] == (100, "delta")  # inserted in delta


def test_funnel_user_without_first_step_is_step0(spark):
    from binlog_spark.queries import window_funnel_steps
    import tempfile, os

    rows = [
        (1, 1, "signup", 0.0), (2, 1, "view", 0.0), (3, 1, "purchase", 0.0),
        (4, 2, "view", 0.0),   # no signup → step 0
        (5, 3, "signup", 0.0),  # signup only → step 1
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double")
    d = tempfile.mkdtemp(prefix="funnel_test_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r["step_reached"]: r["n_users"]
           for r in window_funnel_steps(spark, d).collect()}
    assert out == {0: 1, 1: 1, 3: 1}


def test_temperature_mix_flattens_toward_uniform(spark, sf_dir):
    """T=2 must sit strictly between the natural mix and uniform: the
    head's share shrinks but stays above 1/k; tail shares grow."""
    from binlog_spark.operators.sampling import temperature_mix
    from binlog_spark.queries import _t

    docs = _t(spark, sf_dir, "documents")
    out = {r["lang"]: r for r in
           temperature_mix(docs, group_col="lang").collect()}
    n_total = sum(r["n_docs"] for r in out.values())
    k = len(out)
    head = max(out.values(), key=lambda r: r["n_docs"])
    natural = head["n_docs"] / n_total
    assert 1.0 / k < head["t2_share"] < natural
    tail = min(out.values(), key=lambda r: r["n_docs"])
    assert tail["t2_share"] > tail["n_docs"] / n_total
    assert tail["upsample"] > 1.0 > head["upsample"]


def test_retract_agg_group_migration(spark):
    """An update that MOVES a key between groups must shift its value:
    retraction from the old group, assertion into the new one."""
    from binlog_spark.queries import cdc_retract_agg
    import tempfile, os

    import datetime
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        (1, 1, "view", 10.0, ts),      # U: insert 10 into 'view'
        (2, 1, "click", 7.0, ts),      # U: move key to 'click' with 7
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp")
    d = tempfile.mkdtemp(prefix="retract_test_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r["event_type"]: (r["net_sum"], r["n_live"])
           for r in cdc_retract_agg(spark, d).collect()}
    assert "view" not in out            # fully retracted
    assert out["click"] == (7.0, 1)


def test_phash_identical_payloads_pair_at_zero(spark):
    """Exact duplicates must always pair with hamming 0 (pigeonhole:
    all 4 bands equal), regardless of payload length; near-identical
    payloads stay within the ball."""
    from binlog_spark.operators.multimodal import phash_near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(1, base), (2, base),                      # exact dup
         (3, "Z" * 500),                            # far away
         (4, base.replace("quick", "quack")),       # near dup
         (5, "")],                                  # empty: no hash
        "doc_id long, text string")
    rows = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in phash_near_dup_pairs(df, max_hamming=10).collect()}
    assert rows[(1, 2)] == 0
    assert all(h <= 10 for h in rows.values())
    assert not any(3 in pair or 5 in pair for pair in rows)


def test_phash_band_words_are_16bit(spark):
    from binlog_spark.operators.multimodal import phash64

    df = spark.createDataFrame(
        [(i, f"document number {i} with some text payload {i*7}")
         for i in range(20)], "doc_id long, text string")
    for r in phash64(df).collect():
        assert len(r["bands"]) == 4
        assert all(0 <= w <= 0xFFFF for w in r["bands"])


def test_outbox_route_skips_deletes_and_partitions_stably(spark):
    from binlog_spark.queries import cdc_outbox_route
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 7, "signup", 1.0, '{"a":1}'),
             (2, "2024-01-01 00:00:01", 7, "error", 0.0, '{}'),
             (3, "2024-01-01 00:00:02", 7, "purchase", 2.0, '{"b":2}')],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string") \
            .withColumn("ts", F.to_timestamp("ts")) \
            .write.parquet(os.path.join(d, "events.parquet"))
        out = cdc_outbox_route(spark, d).collect()
    assert sorted(r["seq"] for r in out) == [1, 3]  # delete skipped
    by_seq = {r["seq"]: r for r in out}
    assert by_seq[1]["topic"] == "outbox.event.signup"
    assert by_seq[3]["topic"] == "outbox.event.purchase"
    # same aggregate id -> same stable partition, in [0, 8)
    parts = {r["part"] for r in out}
    assert len(parts) == 1 and 0 <= parts.pop() < 8
    assert by_seq[1]["payload"] == '{"a":1}'


def test_range_frame_excludes_events_older_than_one_hour(spark):
    from binlog_spark.queries import window_range_moving_avg
    import os, tempfile

    rows = [(1, "2024-01-01 00:00:00", 1, "t", 10.0, "{}"),
            (2, "2024-01-01 00:30:00", 1, "t", 20.0, "{}"),
            (3, "2024-01-01 01:00:00", 1, "t", 30.0, "{}"),   # 1h incl.
            (4, "2024-01-01 01:00:00.000001", 1, "t", 40.0, "{}")]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id long, ts string, user_id long,"
            " event_type string, value double, props string") \
            .withColumn("ts", F.to_timestamp("ts")) \
            .write.parquet(os.path.join(d, "events.parquet"))
        got = {r["event_id"]: (r["avg_trailing_1h"], r["n_trailing_1h"])
               for r in window_range_moving_avg(spark, d).collect()}
    assert got[1] == (10.0, 1)
    assert got[2] == (15.0, 2)
    assert got[3] == (20.0, 3)            # frame [00:00:00, 01:00:00]
    assert got[4] == (30.0, 3)            # event 1 now 1h+1us old: out


def test_epoch_schedule_caps_and_shortfall(spark):
    """A tiny source hits the max_epochs cap (its shortfall is the
    unspent allocation); an abundant source takes its full uniform
    draw at < 1 epoch."""
    from binlog_spark.operators.sampling import epoch_schedule

    df = spark.createDataFrame(
        [(i, "tok " * 500, "big") for i in range(40)]
        + [(100, "a b c", "tiny")],
        "doc_id long, text string, source string")
    rows = {r["source"]: r for r in
            epoch_schedule(df, budget=10_000, max_epochs=4).collect()}
    big, tiny = rows["big"], rows["tiny"]
    assert big["target_draw"] == tiny["target_draw"] == 5_000
    assert tiny["n_tokens"] == 3
    assert tiny["sched_draw"] == 12                    # 4 epochs * 3
    assert tiny["epochs_q"] == 4_000_000               # exactly at cap
    assert tiny["shortfall"] == 5_000 - 12
    assert big["sched_draw"] == 5_000 and big["shortfall"] == 0
    assert big["epochs_q"] < 1_000_000                 # < 1 pass


def test_gap_sessions_boundary_inclusive(spark):
    """A gap of EXACTLY the threshold continues the session (strict >
    starts a new one); threshold+1 splits. One user with gaps
    [1800, 1801] has exactly 2 sessions; a single-event user has 1."""
    import os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.queries import window_gap_sessions

    def ts(e):
        return datetime.fromtimestamp(e, tz=timezone.utc).replace(tzinfo=None)

    rows = [(1, ts(0), 1), (2, ts(1800), 1), (3, ts(3601), 1),
            (4, ts(50), 2)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {r["n_sessions"]: (r["n_users"], r["n_events"])
               for r in window_gap_sessions(spark, d).collect()}
    assert got == {2: (1, 3), 1: (1, 1)}


def test_retention_cohorts_epoch_weeks(spark):
    """Cohort = the user's first epoch-week; every cohort has an
    offset-0 cell; a week-2 return lands at offset 2."""
    import os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.queries import window_retention_cohorts, WEEK_SECONDS

    def ts(e):
        return datetime.fromtimestamp(e, tz=timezone.utc).replace(tzinfo=None)

    rows = [(1, ts(100), 10),                       # u10 cohort wk0
            (2, ts(2 * WEEK_SECONDS + 5), 10),      # u10 returns wk2
            (3, ts(2 * WEEK_SECONDS + 50), 20)]     # u20 cohort wk2
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {(r["cohort_wk"], r["week_offset"]):
               (r["n_active_users"], r["n_events"])
               for r in window_retention_cohorts(spark, d).collect()}
    assert got == {(0, 0): (1, 1), (0, 2): (1, 1), (2, 0): (1, 1)}


def test_gini_known_values(spark):
    """Equal revenues -> G = 0; two customers at 100/300 -> G = 0.25
    (the closed form (2*S - (n+1)*T) / (n*T) on exact cent sums)."""
    import os, tempfile
    from datetime import datetime
    from binlog_spark.queries import sql_gini_revenue

    d0 = datetime(1995, 1, 1)

    def run(rows):
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double, "
                  "o_orderdate timestamp")
        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(os.path.join(d, "orders.parquet"))
            return sql_gini_revenue(spark, d).collect()[0]

    eq = run([(1, 1, 200.0, d0), (2, 2, 200.0, d0)])
    assert eq["gini"] == 0.0 and eq["total_revenue"] == 400.0
    uneq = run([(1, 1, 100.0, d0), (2, 2, 300.0, d0)])
    assert uneq["gini"] == 0.25


def test_zipf_slope_exact_power_law(spark):
    """A corpus with freq(r) = 60/r is exactly Zipf s = -1: the log-log
    points are collinear, so the quantized regression recovers -1 to
    within the 1e-6 quantization."""
    import os, tempfile
    from binlog_spark.queries import text_zipf_slope

    words = []
    for r, f in enumerate([60, 30, 20, 15, 12, 10], start=1):
        words += [f"w{r}"] * f
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        row = text_zipf_slope(spark, d).collect()[0]
    assert row["n_types"] == 6 and row["n_tokens"] == 147
    assert abs(row["zipf_slope"] + 1.0) < 1e-4


def test_pit_join_states(spark):
    """One user walking through the full dimension lifecycle: a purchase
    before any dim change is 'none', after signup 'I', after a click
    update 'U', after a delete 'deleted' — and the carried dim value is
    the version in effect, not the latest one."""
    import os, tempfile
    from datetime import datetime
    from binlog_spark.queries import join_scd2_pointintime

    t = datetime(2024, 1, 1)
    rows = [  # (event_id, ts, user_id, event_type, value)
        (2, t, 2, "purchase", 8.0),              # no dim yet -> none
        (1, t, 1, "signup", 10.0),               # opens I v=10
        (3, t, 1, "purchase", 5.0),              # -> I, dim 10
        (5, t, 1, "click", 20.0),                # updates to U v=20
        (7, t, 1, "purchase", 6.0),              # -> U, dim 20
        (9, t, 1, "error", 0.0),                 # delete closes
        (11, t, 1, "purchase", 7.0),             # -> deleted
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {r["dim_state"]: r.asDict()
               for r in join_scd2_pointintime(spark, d).collect()}
    assert set(got) == {"none", "I", "U", "deleted"}
    assert got["none"]["n_facts"] == 1 and got["none"]["sum_dim_vq"] is None
    assert got["I"]["sum_fact_vq"] == 5_000_000
    assert got["I"]["sum_dim_vq"] == 10_000_000
    assert got["U"]["sum_dim_vq"] == 20_000_000
    assert got["deleted"]["min_fact_id"] == 11


def test_minmax_prune_two_files(spark):
    """128 seconds-spaced events = exactly 2 commit files; every window
    scans 1 or 2 files, the edge windows scan exactly 1, and the pruned
    percentage is consistent with the scan counts."""
    import os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.queries import lake_minmax_prune_stats, ZM_WINDOWS

    def ts(e):
        return datetime.fromtimestamp(1_700_000_000 + e,
                                      tz=timezone.utc).replace(tzinfo=None)

    rows = [(i, ts(i), 1, "view", 0.0) for i in range(128)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["window_id"]: r.asDict()
               for r in lake_minmax_prune_stats(spark, d).collect()}
    assert sorted(out) == list(range(ZM_WINDOWS))
    for r in out.values():
        assert r["n_files_total"] == 2
        assert r["n_files_scanned"] in (1, 2)
        assert r["n_rows_scanned"] == 64 * r["n_files_scanned"]
        assert r["pruned_pct_q"] == \
            (2 - r["n_files_scanned"]) * 1_000_000 // 2
    assert out[0]["n_files_scanned"] == 1          # fully inside file 0
    assert out[ZM_WINDOWS - 1]["n_files_scanned"] == 1   # inside file 1
    # windows tile [gmin, gend) exactly: no gaps, no overlaps
    bounds = [(out[k]["lo"], out[k]["hi"]) for k in sorted(out)]
    assert all(bounds[i][1] == bounds[i + 1][0]
               for i in range(len(bounds) - 1))


def test_triangle_count_matches_bruteforce(spark):
    """The degree-oriented wedge enumeration counts exactly the
    triangles a brute-force pass over the same md5-derived graph finds
    (each counted once), and the wedge total matches sum(d*(d-1)/2)."""
    import hashlib, itertools, os, tempfile
    from binlog_spark.queries import graph_triangle_count

    n = 40
    edges = set()
    for a in range(n):
        h = hashlib.md5(str(a).encode()).hexdigest()
        for j in range(3):
            b = int(h[8 * j:8 * j + 7], 16) % n
            if b != a:
                edges.add((min(a, b), max(a, b)))
    adj = {v: set() for v in range(n)}
    for u, v in edges:
        adj[u].add(v); adj[v].add(u)
    tri = sum(1 for u, v, w in itertools.combinations(range(n), 3)
              if v in adj[u] and w in adj[u] and w in adj[v])
    deg = {v: len(a) for v, a in adj.items() if a}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())

    df = spark.createDataFrame([(i, f"doc {i}") for i in range(n)],
                               "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        row = graph_triangle_count(spark, d).collect()[0]
    assert row["n_nodes"] == len(deg)
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    if wedges:
        assert row["gcc_q"] == 3 * tri * 1_000_000_000 // wedges


def test_chunk_dedup_keep_first(spark):
    """Keep-first at chunk granularity: the first occurrence (by doc_id,
    position) of each 8-word chunk survives, later copies anywhere in
    the corpus are removed, and a short trailing chunk is its own unit."""
    import os, tempfile
    from binlog_spark.queries import dedup_chunk_lines, CHUNK_WORDS

    def chunk(tag):
        return [f"{tag}{i}" for i in range(CHUNK_WORDS)]

    A, B, C = chunk("a"), chunk("b"), chunk("c")
    rows = [
        (0, " ".join(A + B), "en", "s1", 0),   # A, B both kept
        (1, " ".join(A + C), "en", "s1", 0),   # A removed, C kept
        (2, " ".join(B), "en", "s2", 0),       # B removed (dup of doc 0)
        (3, "x y z", "en", "s3", 0),           # short chunk, kept
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r["source"]: r.asDict()
               for r in dedup_chunk_lines(spark, d).collect()}
    assert got["s1"] == {"source": "s1", "n_chunks": 4, "n_kept": 3,
                         "n_distinct": 3, "removed_pct_q": 250000}
    assert got["s2"] == {"source": "s2", "n_chunks": 1, "n_kept": 0,
                         "n_distinct": 1, "removed_pct_q": 1000000}
    assert got["s3"]["n_kept"] == 1 and got["s3"]["removed_pct_q"] == 0


def test_late_histogram_matches_bruteforce(spark):
    """The segmented two-phase running max equals a plain Python running
    max over the same md5 arrival order, including bucket boundaries
    (exact powers of two land in the higher bucket via bit-length)."""
    import hashlib, os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.queries import cdc_late_arrival_histogram

    base = 1_700_000_000
    # event i carries event time base + ((i * 37) % 101) seconds — a
    # scrambled event-time sequence independent of the arrival scramble
    def sec(i):
        return base + (i * 37) % 101

    def ts(i):
        return datetime.fromtimestamp(sec(i),
                                      tz=timezone.utc).replace(tzinfo=None)

    n = 60
    rows = [(i, ts(i), 1, "view", 0.0) for i in range(n)]
    order = sorted(range(n),
                   key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(),
                                  i))
    expect = {}
    hwm = None
    for i in order:
        e = sec(i) * 1_000_000
        late = max(0, hwm - e) if hwm is not None else 0
        b = 0 if late == 0 else len(bin(late)) - 2
        lo, hi, c = expect.get(b, (late, late, 0))
        expect[b] = (min(lo, late), max(hi, late), c + 1)
        hwm = e if hwm is None else max(hwm, e)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {r["bucket"]: (r["min_late_us"], r["max_late_us"],
                             r["n_events"])
               for r in cdc_late_arrival_histogram(spark, d).collect()}
    assert got == expect


def test_skyline_matches_bruteforce(spark):
    """The grouped running-max frontier equals the O(n²) dominance
    definition, including duplicate points (which all survive) and
    same-price ties (only the max-date one survives)."""
    import hashlib, os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.queries import sql_skyline_orders

    pts = []
    for k in range(200):
        h = hashlib.md5(str(k).encode()).hexdigest()
        pts.append((k, int(h[:6], 16) % 50, int(h[6:12], 16) % 50))
    pts.append((200, pts[0][1], pts[0][2]))  # exact duplicate of point 0

    def dominated(b):
        return any(p[1] >= b[1] and p[2] >= b[2] and
                   (p[1] > b[1] or p[2] > b[2]) for p in pts)

    expect = {p[0] for p in pts if not dominated(p)}

    def ts(dd):
        return datetime.fromtimestamp(1_700_000_000 + dd * 86400,
                                      tz=timezone.utc).replace(tzinfo=None)

    rows = [(k, 1, "O", pq / 100.0, ts(dd), "1-URGENT")
            for k, pq, dd in pts]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        got = {r["o_orderkey"]
               for r in sql_skyline_orders(spark, d).collect()}
    assert got == expect
    assert 200 in got or 0 not in got  # duplicates live or die together


def test_shard_packing_matches_running_sum(spark):
    """The segmented (bit-length bucket) two-phase prefix SUM equals
    the plain per-source running sum, including a doc bigger than the
    shard capacity (gets shards to itself) and byte conservation."""
    import hashlib, os, tempfile
    from binlog_spark.queries import SHARD_CAPACITY, mm_shard_packing

    docs = []
    for k in range(300):
        h = hashlib.md5(str(k).encode()).hexdigest()
        sz = int(h[:6], 16) % 900 + 16
        if k == 7:
            sz = SHARD_CAPACITY * 3 + 5  # oversized doc
        docs.append((k, "x" * 4, "en", f"src{k % 3}", sz))

    expect = {}
    for s in {d[3] for d in docs}:
        grp = sorted((d for d in docs if d[3] == s),
                     key=lambda d: (-d[4], d[0]))
        start = 0
        for d in grp:
            sh = start // SHARD_CAPACITY
            n, b, m = expect.get((s, sh), (0, 0, 0))
            expect[(s, sh)] = (n + 1, b + d[4], max(m, d[4]))
            start += d[4]

    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {(r["source"], r["shard"]):
               (r["n_docs"], r["shard_bytes"], r["max_doc_bytes"])
               for r in mm_shard_packing(spark, d).collect()}
    assert got == expect
    assert sum(v[1] for v in got.values()) == sum(d[4] for d in docs)


def test_inverted_postings_topk_and_ties(spark):
    """Postings keep at most POSTINGS_TOPK entries ordered by
    (tf desc, doc_id), equal-tf ties break on doc_id, and the df/tf
    stats count the FULL posting list, not just the kept head."""
    import os, tempfile
    from collections import Counter
    from binlog_spark.queries import (POSTINGS_NGRAM, POSTINGS_TOPK,
                                      text_inverted_postings)

    texts = {0: "a b c a b c a b c", 1: "a b c d e f",
             2: "a b c a b c", 3: "z z z z", 4: "d e f d e f"}
    docs = [(k, t, "en", "s", len(t)) for k, t in texts.items()]

    tf = Counter()
    for k, t in texts.items():
        w = t.split(" ")
        for i in range(len(w) - POSTINGS_NGRAM + 1):
            tf[(" ".join(w[i:i + POSTINGS_NGRAM]), k)] += 1
    expect = {}
    for term in {t for t, _ in tf}:
        post = sorted(((d, c) for (t, d), c in tf.items() if t == term),
                      key=lambda p: (-p[1], p[0]))
        expect[term] = (len(post), sum(c for _, c in post),
                        ",".join(f"{d}:{c}"
                                 for d, c in post[:POSTINGS_TOPK]))

    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {r["term"]: (r["df"], r["total_tf"], r["postings"])
               for r in text_inverted_postings(spark, d).collect()}
    assert got == expect


def test_trailing_distinct_matches_bruteforce(spark):
    """Interval-delta rolling distinct equals the quadratic definition,
    covering re-activity inside the window (no double count), gaps
    longer than the window (count decays to 0), and empty middle days
    (still reported, with the carried count)."""
    import os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.queries import (TRAILING_DAYS,
                                      window_trailing_distinct)

    acts = [(1, 0), (1, 2), (1, 3), (2, 0), (2, 20), (3, 5), (3, 5),
            (4, 0), (4, 6), (4, 7), (4, 14), (5, 22)]
    days_lo, days_hi = 0, 22
    expect = {}
    for d in range(days_lo, days_hi + 1):
        expect[d] = len({u for u, ad in acts
                         if d - TRAILING_DAYS < ad <= d})

    def ts(dd):
        return datetime.fromtimestamp(1_700_000_000 + dd * 86400,
                                      tz=timezone.utc).replace(tzinfo=None)

    rows = [(i, ts(ad), u, "view", 0.0)
            for i, (u, ad) in enumerate(acts)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        base = 1_700_000_000 // 86400
        got = {r["day"] - base: r["trailing_users"]
               for r in window_trailing_distinct(spark, d).collect()}
    assert got == expect


def test_ivm_join_deltas_match_oneshot_join(spark):
    """The 3-batch delta decomposition reproduces the one-shot join
    exactly: multi-batch orders, lineitems spread across all batches,
    childless orders dropped, and no pair double-counted (disjoint
    terms) or missed (complete cover)."""
    import os, tempfile
    from binlog_spark.queries import cdc_ivm_join_deltas

    orders = [(k, 1, "O", 10.0, None, "x") for k in range(40)]
    lines = []
    for k in range(40):
        for ln in range(1, (k % 4) + 1):  # k%4==0 -> childless order
            lines.append((k, ln, float(ln), 100.0 + k))
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp, "
                "o_orderpriority string")
    ldf = spark.createDataFrame(
        lines, "l_orderkey long, l_linenumber long, l_quantity double, "
               "l_extendedprice double")
    with tempfile.TemporaryDirectory() as d:
        odf.write.parquet(os.path.join(d, "orders.parquet"))
        ldf.write.parquet(os.path.join(d, "lineitem.parquet"))
        got = {(r["ba"], r["bb"]): (r["n_pairs"], r["sum_qty_q"],
                                    r["sum_price_cents"])
               for r in cdc_ivm_join_deltas(spark, d).collect()}
    # brute-force one-shot join with the same md5 batches
    import hashlib

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16) % 3

    expect = {}
    for k, ln, q, p in lines:
        ba, bb = bucket(str(k)), bucket(f"{k}-{ln}")
        n, sq, sp = expect.get((ba, bb), (0, 0, 0))
        expect[(ba, bb)] = (n + 1, sq + round(q * 100),
                            sp + round(p * 100))
    assert got == expect
    assert sum(v[0] for v in got.values()) == len(lines)


def test_markov_transitions_bruteforce(spark):
    """Transition counts and quantized row probabilities equal the
    sequential definition, including ts ties broken by event_id and
    single-event users contributing nothing."""
    import os, tempfile
    from collections import Counter
    from datetime import datetime, timezone
    from binlog_spark.queries import window_markov_transitions

    seqs = {1: ["a", "b", "a", "b", "c"], 2: ["b", "b", "b"],
            3: ["c"], 4: ["a", "c", "a", "c"]}
    rows, eid = [], 0
    for u, seq in seqs.items():
        for i, t in enumerate(seq):
            sec = 1_700_000_000 + (0 if u == 2 else i * 60)  # u2: ts ties
            rows.append((eid, datetime.fromtimestamp(
                sec, tz=timezone.utc).replace(tzinfo=None), u, t, 0.0))
            eid += 1

    cnt = Counter()
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    tot = Counter()
    for (a, _), n in cnt.items():
        tot[a] += n
    expect = {(a, b): (n, n * 1_000_000 // tot[a])
              for (a, b), n in cnt.items()}

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {(r["prev"], r["cur"]): (r["n_trans"], r["prob_q"])
               for r in window_markov_transitions(spark, d).collect()}
    assert got == expect


def test_overlap_depth_matches_quadratic(spark):
    """Merge-rank overlap depth equals the O(F^2) definition on a
    layout with nested, disjoint, touching (boundary-equal) and
    identical intervals."""
    import os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.operators.lake_layout import FILE_EVENTS
    from binlog_spark.queries import lake_overlap_depth

    # per-file (min_sec, max_sec): 0:[0,10] 1:[5,7] nested, 2:[10,12]
    # touches 0, 3:[20,25] disjoint, 4:[20,25] identical to 3,
    # 5:[26,40] touches nothing, 6:[0,40] spans everything
    spans = [(0, 10), (5, 7), (10, 12), (20, 25), (20, 25), (26, 40),
             (0, 40)]
    expect_depth = {}
    for i, (a, b) in enumerate(spans):
        d = sum(1 for j, (c, e) in enumerate(spans)
                if j != i and c <= b and e >= a)
        expect_depth[i] = d
    expect = {}
    for d in expect_depth.values():
        expect[d] = expect.get(d, 0) + 1

    def ts(sec):
        return datetime.fromtimestamp(1_700_000_000 + sec,
                                      tz=timezone.utc).replace(tzinfo=None)

    rows = []
    for i, (a, b) in enumerate(spans):
        base = i * FILE_EVENTS
        rows.append((base, ts(a), 1, "view", 0.0))
        rows.append((base + 1, ts(b), 1, "view", 0.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {r["depth"]: r["n_files"]
               for r in lake_overlap_depth(spark, d).collect()}
    assert got == expect


def test_decayed_counts_dyadic_weights(spark):
    """Weights are exact dyadic integers: events at 0/1/2 half-lives
    before the watermark weigh 2^40/2^39/2^38; beyond DECAY_MAX_K
    half-lives the weight is exactly 0."""
    import os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.queries import (DECAY_HALFLIFE_S, DECAY_MAX_K,
                                      agg_decayed_counts)

    T = 1_700_000_000
    offs = {"a": [0, DECAY_HALFLIFE_S, 2 * DECAY_HALFLIFE_S],
            "b": [0, (DECAY_MAX_K + 1) * DECAY_HALFLIFE_S],
            "c": [DECAY_HALFLIFE_S // 2]}  # k=0 -> full weight
    expect = {"a": (3, (1 << 40) + (1 << 39) + (1 << 38)),
              "b": (2, (1 << 40) + 0),
              "c": (1, 1 << 40)}

    rows, eid = [], 0
    for t, ds in offs.items():
        for d in ds:
            rows.append((eid, datetime.fromtimestamp(
                T - d, tz=timezone.utc).replace(tzinfo=None), 1, t, 0.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {r["event_type"]: (r["n_events"], r["decayed_q40"])
               for r in agg_decayed_counts(spark, d).collect()}
    assert got == expect


def test_drift_histogram_contributions(spark):
    """TVD/chi-squared contributions are exact integers; a bucket
    populated only in the current half carries the -1 chi-squared
    sentinel; per-half quantized probabilities sum to ~1e6."""
    import hashlib, os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.queries import DRIFT_BUCKETS, drift_value_histogram

    rows = []
    for eid in range(400):
        half = int(hashlib.md5(str(eid).encode()).hexdigest()[:12],
                   16) % 2
        # ref half: values 0..9; cur half: values 6..15 (shifted)
        v = (eid % 10) + (6 if half else 0)
        rows.append((eid, datetime.fromtimestamp(
            1_700_000_000, tz=timezone.utc).replace(tzinfo=None),
            1, "view", float(v)))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = drift_value_histogram(spark, d).collect()

    assert sum(r["p_ref"] for r in out) <= 1_000_000
    assert sum(r["p_ref"] for r in out) > 1_000_000 - DRIFT_BUCKETS
    for r in out:
        if r["n_ref"] == 0 and r["n_cur"] > 0:
            assert r["chi2_contrib_q"] == -1
            assert r["tvd_contrib_q"] == r["p_cur"]
        if r["n_ref"] > 0:
            assert r["chi2_contrib_q"] == ((r["p_cur"] - r["p_ref"]) ** 2
                                           * 1_000_000 // r["p_ref"])
    assert any(r["n_ref"] == 0 and r["n_cur"] > 0 for r in out)
    assert any(r["n_cur"] == 0 and r["n_ref"] > 0 for r in out)


import pytest as _pytest


@_pytest.mark.parametrize("seed", [11, 23, 47])
def test_trailing_distinct_randomized(spark, seed):
    """Seeded random activity sets vs the quadratic definition —
    regression net for the interval-delta rewrite's tie logic."""
    import hashlib, os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.queries import (TRAILING_DAYS,
                                      window_trailing_distinct)

    acts = set()
    for i in range(120):
        h = hashlib.md5(f"{seed}-{i}".encode()).hexdigest()
        acts.add((int(h[:4], 16) % 9 + 1, int(h[4:8], 16) % 25))
    acts = sorted(acts)
    lo = min(d for _, d in acts)
    hi = max(d for _, d in acts)
    expect = {d: len({u for u, ad in acts
                      if d - TRAILING_DAYS < ad <= d})
              for d in range(lo, hi + 1)}

    rows = [(i, datetime.fromtimestamp(
        1_700_000_000 + ad * 86400,
        tz=timezone.utc).replace(tzinfo=None), u, "view", 0.0)
        for i, (u, ad) in enumerate(acts)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    base = 1_700_000_000 // 86400
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {r["day"] - base: r["trailing_users"]
               for r in window_trailing_distinct(spark, d).collect()}
    assert got == expect
    assert min(got) == lo and max(got) == hi


@_pytest.mark.parametrize("seed", [5, 19])
def test_overlap_depth_randomized(spark, seed):
    """Seeded random interval layouts vs the quadratic definition —
    regression net for the merge-rank boundary/tie arithmetic."""
    import hashlib, os, tempfile
    from datetime import datetime, timezone
    from binlog_spark.operators.lake_layout import FILE_EVENTS
    from binlog_spark.queries import lake_overlap_depth

    spans = []
    for i in range(25):
        h = hashlib.md5(f"{seed}-{i}".encode()).hexdigest()
        a = int(h[:4], 16) % 50
        b = a + int(h[4:8], 16) % 12
        spans.append((a, b))
    expect = {}
    for i, (a, b) in enumerate(spans):
        d = sum(1 for j, (c, e) in enumerate(spans)
                if j != i and c <= b and e >= a)
        expect[d] = expect.get(d, 0) + 1

    def ts(sec):
        return datetime.fromtimestamp(1_700_000_000 + sec,
                                      tz=timezone.utc).replace(tzinfo=None)

    rows = []
    for i, (a, b) in enumerate(spans):
        rows.append((i * FILE_EVENTS, ts(a), 1, "view", 0.0))
        rows.append((i * FILE_EVENTS + 1, ts(b), 1, "view", 0.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = {r["depth"]: r["n_files"]
               for r in lake_overlap_depth(spark, d).collect()}
    assert got == expect


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_misra_gries_superset_guarantee(spark, seed):
    """Every key with frequency > n/(k+1) must survive into the merged
    partials (the mergeable-summaries bound), its merged lower bound
    must never exceed the true count, and the partial row count must
    respect the k-per-partition cap — on an adversarially skewed
    multiset under several partitionings."""
    import hashlib
    from collections import Counter
    from binlog_spark.operators.folds import misra_gries_partials

    # Zipf-ish: key j contributes ~ n / (j+1)^2 copies + hash noise
    vals = []
    for j in range(40):
        h = int(hashlib.md5(f"{seed}-{j}".encode()).hexdigest()[:4], 16)
        vals += [j] * (2000 // (j + 1) ** 2 + h % 3)
    # deterministic shuffle (positional, stable under duplicates)
    vals = [v for _, v in sorted(
        enumerate(vals),
        key=lambda iv: hashlib.md5(f"{seed}:{iv[0]}".encode()).hexdigest())]
    true = Counter(vals)
    n, k = len(vals), 8
    df = spark.createDataFrame([(v,) for v in vals], "key_bucket long")
    for parts in (1, 3, 7):
        partials = misra_gries_partials(
            df.repartition(parts), "key_bucket", k=k)
        rows = partials.collect()
        assert len(rows) <= k * parts
        merged = Counter()
        for r in rows:
            merged[r["key_bucket"]] += r["lb"]
        for key, lb in merged.items():
            assert lb <= true[key], (key, lb, true[key])
        for key, cnt in true.items():
            if cnt > n / (k + 1):
                assert key in merged, (key, cnt, n, parts)


def test_heavy_hitters_equals_exact(spark, sf_dir):
    """The sketch+verify pipeline must equal the plain GROUP BY + HAVING
    computed engine-side (not just the DuckDB oracle)."""
    from binlog_spark.queries import agg_heavy_hitters, _t, HH_SHARE_DEN

    got = {(r["key_bucket"], r["cnt"], r["share_q"])
           for r in agg_heavy_hitters(spark, sf_dir).collect()}
    ev = _t(spark, sf_dir, "events").select(
        (F.length(F.expr("bin(user_id + 1)")) - 1).cast("long")
        .alias("key_bucket"))
    n = ev.count()
    exact = {(r["key_bucket"], r["cnt"], r["cnt"] * 1_000_000 // n)
             for r in ev.groupBy("key_bucket")
             .agg(F.count("*").alias("cnt")).collect()
             if r["cnt"] * HH_SHARE_DEN > n}
    assert got == exact


@pytest.mark.parametrize("case", ["skew", "constant", "two"])
def test_exact_median_2pass_edges(spark, case, tmp_path):
    """The 2-pass median on degenerate shapes: heavy-tail skew (median
    bucket crowded), all-equal values (one bucket), two values."""
    import os
    from binlog_spark.queries import agg_exact_median_2pass

    if case == "skew":
        vals = [0.000001 * (i % 7) for i in range(999)] + [9.5]
    elif case == "constant":
        vals = [1.25] * 501
    else:
        vals = [2.0, 3.0]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = agg_exact_median_2pass(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    qs = sorted(round(v * 1_000_000) for v in vals)
    k = (len(vals) + 1) // 2
    assert r["n"] == len(vals) and r["k_rank"] == k
    assert r["median_q"] == qs[k - 1]


def test_nearest_asof_tie_and_sentinel(spark, tmp_path):
    """Equal-distance ties resolve to the earlier (backward) click;
    purchases with no click at all get the (-1, 0) sentinel; forward
    wins when strictly closer."""
    import os
    from datetime import datetime, timezone
    from binlog_spark.queries import join_nearest_asof

    def ts(sec):
        return datetime.fromtimestamp(1_700_000_000 + sec,
                                      tz=timezone.utc).replace(tzinfo=None)

    rows = [
        # user 1: click@10, purchase@15, click@20 -> tie, backward wins
        (100, ts(10), 1, "click", 0.0, "{}"),
        (101, ts(15), 1, "purchase", 0.0, "{}"),
        (102, ts(20), 1, "click", 0.0, "{}"),
        # user 2: purchase@5, click@6 -> forward wins (no backward)
        (200, ts(5), 2, "purchase", 0.0, "{}"),
        (201, ts(6), 2, "click", 0.0, "{}"),
        # user 3: click@40, purchase@49 -> backward only
        (300, ts(40), 3, "click", 0.0, "{}"),
        (301, ts(49), 3, "purchase", 0.0, "{}"),
        # user 4: no clicks at all
        (400, ts(7), 4, "purchase", 0.0, "{}"),
        # user 5: click@30, purchase@30 -> equal ts counts as backward
        (500, ts(30), 5, "click", 0.0, "{}"),
        (501, ts(30), 5, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    got = {r["purchase_id"]: (r["nearest_click_id"], r["delta_us"])
           for r in join_nearest_asof(spark, str(tmp_path)).collect()}
    assert got == {
        101: (100, -5_000_000),
        200: (201, 1_000_000),
        301: (300, -9_000_000),
        400: (-1, 0),
        501: (500, 0),
    }


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 13, 100])
def test_rfm_ntile_arithmetic_matches_native(spark, n):
    """The global_rank + integer NTILE(4) arithmetic must equal Spark's
    native ntile(4) for every group-size residue (incl. n < 4)."""
    from pyspark.sql import Window
    from binlog_spark.operators import ranking

    df = spark.range(n).select(
        (F.col("id") * 29 % 97).alias("v"), F.col("id").alias("k"))
    native = {(r["v"], r["k"]): r["q"] for r in df.withColumn(
        "q", F.ntile(4).over(Window.orderBy("v", "k"))).collect()}
    ranked = (ranking.global_rank(df, ["v", "k"], out_col="_rn")
              .withColumn("n_cust", F.lit(n)))
    mine = {(r["v"], r["k"]): r["q"] for r in ranked.withColumn(
        "q", F.expr(
            "CASE WHEN _rn <= (n_cust % 4) * (n_cust div 4 + 1) "
            "THEN (_rn - 1) div (n_cust div 4 + 1) + 1 "
            "ELSE n_cust % 4 + 1 + (_rn - (n_cust % 4) "
            "* (n_cust div 4 + 1) - 1) div greatest(n_cust div 4, 1) "
            "END")).collect()}
    assert mine == native


def test_kcore_peel_cascades_and_caps(spark):
    """A clique survives its own k-core; a pendant chain peels away
    round by round (cascade), and a round cap below the cascade depth
    reproduces exactly the capped state (what the unrolled oracle
    computes)."""
    from binlog_spark.operators.graph import kcore_peel

    # K4 clique on {0,1,2,3} + chain 3-4-5-6 (chain peels under k=2:
    # round 1 drops 6, round 2 drops 5, round 3 drops 4)
    clique = [(u, v) for u in range(4) for v in range(u + 1, 4)]
    chain = [(3, 4), (4, 5), (5, 6)]
    edges = spark.createDataFrame(clique + chain, "u long, v long")

    full = {r["node"]: r["deg"] for r in kcore_peel(edges, k=2).collect()}
    assert full == {0: 3, 1: 3, 2: 3, 3: 3}

    # cap at 2 rounds: 6 and then 5 are gone, 4 still has deg 1 < 2 in
    # the remaining edges, so the final >=k filter drops it too — but
    # edge (3,4) is still alive, leaving node 3 at degree 4
    capped = {r["node"]: r["deg"]
              for r in kcore_peel(edges, k=2, max_rounds=2).collect()}
    assert capped == {0: 3, 1: 3, 2: 3, 3: 4}

    # k above the max degree peels everything
    assert kcore_peel(edges, k=5).count() == 0


def test_bfs_levels_distance_and_cap(spark):
    """Hop distances on a known graph: chain 0-1-2-3-4 plus isolated
    edge (8,9); source {0}. Unreachable nodes are absent; a round cap
    truncates levels exactly (what the unrolled oracle computes)."""
    from binlog_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (8, 9)], "u long, v long")
    src = spark.createDataFrame([(0,)], "node long")
    full = {r["node"]: r["level"]
            for r in bfs_levels(edges, src, max_rounds=8).collect()}
    assert full == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
    capped = {r["node"]: r["level"]
              for r in bfs_levels(edges, src, max_rounds=2).collect()}
    assert capped == {0: 0, 1: 1, 2: 2}
    # multi-source: nearest source wins
    src2 = spark.createDataFrame([(0,), (4,)], "node long")
    multi = {r["node"]: r["level"]
             for r in bfs_levels(edges, src2, max_rounds=8).collect()}
    assert multi == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_curation_pipeline_stage_invariants(spark, sf_dir):
    """Monotone stage counts; language balance: every language keeps
    exactly the minority post-gate count."""
    from binlog_spark.queries import pipeline_curation_e2e

    rows = pipeline_curation_e2e(spark, sf_dir).collect()
    n_min = min(r["n_gate"] for r in rows)
    for r in rows:
        assert r["n_raw"] >= r["n_dedup"] >= r["n_gate"] >= r["n_kept"]
        assert r["n_kept"] == n_min


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_max_subarray_monoid_vs_bruteforce(spark, seed, tmp_path):
    """The segment-monoid fold must equal the O(n^2) brute force on
    seeded signed series — including all-negative series (best =
    single largest element) and single-day series."""
    import hashlib
    import os
    from datetime import datetime, timezone
    from binlog_spark.queries import (agg_max_subarray_daily,
                                      SUBARRAY_CENTER_Q)

    n_days = [1, 2, 7, 40][seed]
    xs = []
    for d in range(n_days):
        h = int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:8], 16)
        xs.append((h % 2001) - 1000 - (1000 if seed == 1 else 0))

    rows = []
    for d, x in enumerate(xs):
        # one event per day carrying exactly the centered value x (in
        # 1e-6 units): value = (x + CENTER) / 1e6
        ts = datetime.fromtimestamp(1_700_000_000 + d * 86_400,
                                    tz=timezone.utc).replace(tzinfo=None)
        rows.append((d, ts, 1, "view", (x + SUBARRAY_CENTER_Q) / 1e6))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))

    out = agg_max_subarray_daily(spark, str(tmp_path)).collect()[0]
    brute = max(sum(xs[i:j + 1])
                for i in range(len(xs)) for j in range(i, len(xs)))
    assert out["n_days"] == n_days
    assert out["series_total_q"] == sum(xs)
    assert out["max_subarray_q"] == brute


def test_heaps_curve_min_rewrite_vs_bruteforce(spark, tmp_path):
    """The min(doc_id)-histogram rewrite must equal the brute-force
    per-decile distinct-gram count on a seeded corpus with heavy
    cross-document repetition."""
    import hashlib
    import os
    from binlog_spark.queries import text_heaps_law_curve, HEAPS_DECILES

    words = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = []
    for d in range(40):
        h = int(hashlib.md5(f"h{d}".encode()).hexdigest()[:8], 16)
        toks = [words[(h >> (2 * j)) % len(words)] for j in range(6)]
        docs.append((d, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))

    got = {r["decile"]: (r["new_grams"], r["vocab_cum"])
           for r in text_heaps_law_curve(spark, str(tmp_path)).collect()}

    def grams(t):
        tt = t.split(" ")
        return {" ".join(tt[i:i + 3]) for i in range(len(tt) - 2)}

    n = len(docs)
    seen, brute = set(), {}
    per_decile = {}
    for d, t in docs:
        dec = min(d * HEAPS_DECILES // n, HEAPS_DECILES - 1)
        per_decile.setdefault(dec, set()).update(grams(t))
    cum = set()
    for dec in sorted(per_decile):
        new = per_decile[dec] - cum
        cum |= per_decile[dec]
        brute[dec] = (len(new), len(cum))
    assert got == brute


def test_ks_argmax_earliest_on_tie(spark, tmp_path):
    """The packed-key argmax must return the EARLIEST value achieving
    the max gap; hand-built halves with a known flat-gap plateau."""
    import os
    from binlog_spark.queries import agg_ks_two_sample

    # md5-half assignment is fixed by event_id; find ids per half first
    import hashlib

    def half(eid):
        return int(hashlib.md5(str(eid).encode()).hexdigest()[:12],
                   16) % 2

    ids0 = [i for i in range(200) if half(i) == 0][:3]
    ids1 = [i for i in range(200) if half(i) == 1][:3]
    # half0 values {1,2,3}, half1 values {3,4,5}: CDF gap peaks (=2/3
    # scaled) first at vq=2e6 — earliest of the plateau {2e6}
    rows = ([(e, v) for e, v in zip(ids0, [1.0, 2.0, 3.0])]
            + [(e, v) for e, v in zip(ids1, [3.0, 4.0, 5.0])])
    df = spark.createDataFrame(rows, "event_id long, value double")
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    r = agg_ks_two_sample(spark, str(tmp_path)).collect()[0]
    assert (r["n1"], r["n2"]) == (3, 3)
    assert r["ks_num"] == 6  # |F1*n2 - F2*n1| = |2*3 - 0*3|
    assert r["ks_at_vq"] == 2_000_000


def test_twap_known_series(spark, tmp_path):
    """TWAP on a hand-built irregular series: value 10 held 3 s, then
    30 held 1 s -> twap = (10*3 + 30*1)/4 = 15 (milli-units)."""
    import os
    from datetime import datetime, timezone
    from binlog_spark.queries import window_twap_per_user

    def ts(sec):
        return datetime.fromtimestamp(1_700_000_000 + sec,
                                      tz=timezone.utc).replace(tzinfo=None)

    rows = [(1, ts(0), 7, 10.0), (2, ts(3), 7, 30.0), (3, ts(4), 7, 99.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    r = window_twap_per_user(spark, str(tmp_path)).collect()[0]
    assert r["n_segments"] == 2 and r["total_dt_s"] == 4
    assert r["twap_q3"] == 15_000


def test_bitmap_distinct_word_boundaries(spark, tmp_path):
    """Ids straddling the 62-bit word boundary (61, 62, 123, 124) must
    each count exactly once; duplicates collapse."""
    import os
    from datetime import datetime, timezone
    from binlog_spark.queries import agg_bitmap_distinct

    t = datetime.fromtimestamp(1_700_000_000,
                               tz=timezone.utc).replace(tzinfo=None)
    uids = [0, 61, 61, 62, 123, 124, 124, 124]
    rows = [(i, t, u) for i, u in enumerate(uids)]
    df = spark.createDataFrame(rows,
                               "event_id long, ts timestamp, user_id long")
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    r = agg_bitmap_distinct(spark, str(tmp_path)).collect()[0]
    assert r["n_rows"] == 8
    assert r["n_words"] == 3   # words 0 (0,61), 1 (62,123), 2 (124)
    assert r["n_distinct_users"] == 5


def test_peak_concurrency_half_open_boundary(spark, tmp_path):
    """An interval ending exactly when another starts must NOT overlap
    it (ends sort before coincident starts): two touching user-day
    spans peak at 1; genuinely overlapping spans peak at 2."""
    import os
    from datetime import datetime, timezone
    from binlog_spark.queries import window_peak_concurrency

    def ts(sec):
        return datetime.fromtimestamp(1_700_000_000 + sec,
                                      tz=timezone.utc).replace(tzinfo=None)

    # same day: user 1 spans [0, 100], user 2 spans [100, 200] (touch)
    rows = [(1, ts(0), 1), (2, ts(100), 1),
            (3, ts(100), 2), (4, ts(200), 2)]
    df = spark.createDataFrame(rows,
                               "event_id long, ts timestamp, user_id long")
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    r = window_peak_concurrency(spark, str(tmp_path)).collect()[0]
    assert r["peak_concurrency"] == 1

    # overlap: user 2 starts inside user 1's span
    rows2 = [(1, ts(0), 1), (2, ts(100), 1),
             (3, ts(50), 2), (4, ts(200), 2)]
    df2 = spark.createDataFrame(rows2,
                                "event_id long, ts timestamp, user_id long")
    d2 = os.path.join(str(tmp_path), "ov")
    os.makedirs(d2, exist_ok=True)
    df2.write.parquet(os.path.join(d2, "events.parquet"))
    r2 = window_peak_concurrency(spark, d2).collect()[0]
    assert r2["peak_concurrency"] == 2
    assert r2["peak_at_us"] == (1_700_000_000 + 50) * 1_000_000


def test_order_inversions_known_permutation(spark, tmp_path):
    """Arrival order 0,1,2,3 with event times 40,30,20,10 is fully
    reversed -> all 6 pairs inverted; a sorted stream has 0."""
    import os
    from datetime import datetime, timezone
    from binlog_spark.queries import cdc_order_inversions

    def ts(sec):
        return datetime.fromtimestamp(1_700_000_000 + sec,
                                      tz=timezone.utc).replace(tzinfo=None)

    rows = [(i, ts(40 - 10 * i), 1) for i in range(4)]
    rows += [(100 + i, ts(i), 2) for i in range(4)]
    df = spark.createDataFrame(rows,
                               "event_id long, ts timestamp, user_id long")
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = {r["user_id"]: (r["n_pairs"], r["n_inversions"],
                          r["inv_share_q"])
           for r in cdc_order_inversions(spark, str(tmp_path)).collect()}
    assert out[1] == (6, 6, 1_000_000)
    assert out[2] == (6, 0, 0)
