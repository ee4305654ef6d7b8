"""Property sweep for the stateful streaming sessionizer: a randomized
event log, split into per-user TIME-ORDERED micro-batches (the kernel's
documented arrival contract — normal daily-ingest shape), drained with
``maxFilesPerTrigger=1`` must equal the batch ``sessionize`` exactly.

This is the guarantee the example-based replay tests can't give: they
drain in ONE batch, so the cross-batch state carry (last_ts handoff,
session continuation across a file boundary, gap-exactly-equal NOT
splitting) was never exercised under random shapes. Timestamps are drawn
tie-heavy and gap-straddling on purpose."""
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

GAP_MIN = 1
GAP_NS = GAP_MIN * 60 * 1_000_000_000

# events as (user, ts_step) where consecutive per-user deltas are multiples
# / fractions of the gap: 0 (tie), half-gap (same session), EXACTLY the gap
# (contract: NOT a new session — the rule is strict >), gap+1ns (new)
delta = st.sampled_from([0, GAP_NS // 2, GAP_NS, GAP_NS + 1, 3 * GAP_NS])
event = st.tuples(st.integers(0, 2), delta)
log = st.lists(event, min_size=1, max_size=18)


def build_rows(data):
    """Cumulate per-user deltas into absolute ns timestamps; event_id is
    the global sequence number (the deterministic tiebreaker)."""
    cur = {}
    rows = []
    for i, (u, d) in enumerate(data):
        cur[u] = cur.get(u, 1_000_000_000_000) + d
        rows.append((u, i, cur[u]))
    return rows  # (user_id, event_id, ts)


@given(data=log, n_files=st.integers(1, 3))
@settings(**SET)
def test_multibatch_drain_equals_batch_sessionize(spark, data, n_files, tmp_path_factory):
    from flatbread_spark.streaming.stateful import stream_sessionize
    from flatbread_spark.streaming.windows import sessionize

    rows = build_rows(data)
    df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, ts bigint")
    batch = {
        r["user_id"]: (r["n_sessions"], r["n_events"], r["max_session_events"])
        for r in sessionize(df, gap_minutes=GAP_MIN).collect()
    }
    # independent pure-Python oracle: stream==batch alone would pass if
    # BOTH were identically wrong — anchor the pair to a third derivation
    expect = {}
    by_user = {}
    for u, eid, ts in sorted(rows, key=lambda r: (r[2], r[1])):
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        n_sessions, cur, mx, last = 0, 0, 0, None
        for ts in tss:
            if last is None or ts - last > GAP_NS:
                n_sessions += 1
                cur = 0
            cur += 1
            mx = max(mx, cur)
            last = ts
        expect[u] = (n_sessions, len(tss), mx)
    assert batch == expect

    # split by GLOBAL time into contiguous files: per-user batch arrival is
    # then time-ordered, the kernel's documented contract
    ordered = sorted(rows, key=lambda r: (r[2], r[1]))
    per_file = max(1, (len(ordered) + n_files - 1) // n_files)
    stream_dir = tmp_path_factory.mktemp("sess_sweep")
    for fi in range(n_files):
        part = ordered[fi * per_file : (fi + 1) * per_file]
        if not part:
            continue
        spark.createDataFrame(
            part, "user_id bigint, event_id bigint, ts bigint"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(stream_dir / f"f{fi}.parquet")
        )
    # each f{fi}.parquet is a DIRECTORY of one part-file; stream the glob
    sdf = stream_sessionize(
        spark,
        str(stream_dir / "*" / "*.parquet"),
        df.schema,
        gap_minutes=GAP_MIN,
        max_files_per_trigger=1,
    )
    name = f"sess_sweep_{abs(hash((tuple(data), n_files))) % 10**9}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    got = {
        int(r.user_id): (
            int(r.n_sessions), int(r.n_events), int(r.max_session_events)
        )
        for r in pdf.groupby("user_id").tail(1).itertuples()
    }
    spark.catalog.dropTempView(name)
    assert got == batch


def test_session_straddles_file_boundary(spark, tmp_path):
    """Directed proof the sweep exercises the cross-batch carry: one
    user's 6 events across 3 single-row-pair files, with one SESSION
    straddling the second file boundary (half-gap step across files) —
    update mode must emit one refreshed row per micro-batch (3 rows) and
    the final totals must equal the batch answer."""
    from flatbread_spark.streaming.stateful import stream_sessionize
    from flatbread_spark.streaming.windows import sessionize

    t0 = 1_000_000_000_000
    rows = [
        (7, 0, t0),
        (7, 1, t0 + GAP_NS // 2),            # same session
        (7, 2, t0 + 4 * GAP_NS),             # new session   | file 1 ends
        (7, 3, t0 + 4 * GAP_NS + GAP_NS // 2),  # continues across boundary
        (7, 4, t0 + 9 * GAP_NS),             # new session   | file 2 ends
        (7, 5, t0 + 9 * GAP_NS + GAP_NS),    # EXACTLY gap: continues (strict >)
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, ts bigint")
    batch = sessionize(df, gap_minutes=GAP_MIN).collect()[0]
    assert (batch["n_sessions"], batch["n_events"], batch["max_session_events"]) \
        == (3, 6, 2)

    for fi in range(3):
        spark.createDataFrame(
            rows[2 * fi : 2 * fi + 2], "user_id bigint, event_id bigint, ts bigint"
        ).coalesce(1).write.parquet(str(tmp_path / f"f{fi}.parquet"))
    sdf = stream_sessionize(
        spark, str(tmp_path / "*" / "*.parquet"), df.schema,
        gap_minutes=GAP_MIN, max_files_per_trigger=1,
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("sess_straddle")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql("SELECT * FROM sess_straddle").toPandas()
    spark.catalog.dropTempView("sess_straddle")
    # one update row per micro-batch: the drain really ran 3 batches
    assert len(pdf) == 3
    last = pdf.iloc[-1]
    assert (int(last.n_sessions), int(last.n_events),
            int(last.max_session_events)) == (3, 6, 2)


def test_stream_dedup_drops_cross_batch_duplicate(spark, tmp_path):
    """Cross-batch dedup state: a duplicate fingerprint arriving in a
    LATER micro-batch (within the watermark delay) must be dropped — the
    existing replay test drains one batch, so the keyed state lookup
    across batches was never exercised. Also pins the survivor: the FIRST
    arrival's row is the one emitted."""
    from flatbread_spark.streaming.dedup import stream_dedup_exact

    base = 1_700_000_000
    f1 = [(0, "alpha text", base), (1, "beta text", base + 1)]
    f2 = [(2, "alpha text", base + 60),   # dup of doc 0, next batch
          (3, "gamma text", base + 61)]
    schema = "doc_id bigint, text string, sec bigint"
    for fi, rows in enumerate((f1, f2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / f"f{fi}.parquet")
        )
    sdf = (
        spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "*" / "*.parquet"))
        .withColumn("ts", F.timestamp_seconds(F.col("sec")))
    )
    deduped = stream_dedup_exact(sdf, "text", "ts", delay="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_xbatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, text FROM dedup_xbatch").collect()
    spark.catalog.dropTempView("dedup_xbatch")
    got = {r["doc_id"] for r in rows}
    assert got == {0, 1, 3}, got  # doc 2 (the cross-batch dup) dropped


def test_stream_heavy_hitters_recall_across_batches(spark, tmp_path):
    """Misra-Gries recall must survive the CROSS-BATCH state merge: a
    token whose global frequency clears N/(width+1) only when both
    micro-batches are combined (8+8=16 of N=48 > 48/5) must be in the
    drained candidates even though each batch alone also brings 16 fresh
    noise tokens competing for the 4 counters. The existing heavy-hitter
    test drains one batch, so the state-carry decrement path was never
    exercised."""
    from flatbread_spark.streaming.topk import (
        drain_final_summary,
        stream_heavy_hitters,
    )

    schema = "doc_id bigint, text string"
    mk = lambda fi: [
        (fi * 100 + i, f"hot noise{fi}a{i} noise{fi}b{i}") for i in range(8)
    ]
    for fi in range(2):
        spark.createDataFrame(mk(fi), schema).coalesce(1).write.parquet(
            str(tmp_path / f"f{fi}.parquet")
        )
    sdf = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "*" / "*.parquet"))
    )
    hh = stream_heavy_hitters(sdf, "text", width=4, n_buckets=2)
    q = (
        hh.writeStream.format("memory")
        .queryName("hh_xbatch")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM hh_xbatch")
    # the drain really ran 2 micro-batches: summary seq advances past 1
    assert emitted.agg(F.max("seq")).first()[0] >= 2
    cand = {r["token"] for r in drain_final_summary(emitted).collect()}
    spark.catalog.dropTempView("hh_xbatch")
    assert "hot" in cand
