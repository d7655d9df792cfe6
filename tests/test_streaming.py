"""Structured Streaming front-ends: windowed rollup result must equal
the equivalent batch aggregation; seed ingestion must honor J2
admission (dedup within batch + anti-join vs seen)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wormpy_spark.streaming.stream import stream_frontier_ingest, stream_metrics_rollup

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_stream_rollup_equals_batch(spark, tmp_path):
    src = "/root/testdata/sf0.001"
    # copy events into a dedicated stream-source dir
    events = spark.read.parquet(f"{src}/events.parquet")
    srcdir = str(tmp_path / "events_src")
    events.write.parquet(srcdir)

    out = str(tmp_path / "out")
    q = stream_metrics_rollup(
        spark, srcdir, EVENTS_SCHEMA, str(tmp_path / "ckpt"), out
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["sum_value"])
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .collect()
    }
    # append mode holds back windows still inside the watermark at end
    # of stream; everything emitted must match batch exactly, and the
    # held-back remainder must be only the trailing watermark horizon.
    assert len(got) > 10
    for k, v in got.items():
        assert want[k] == v
    max_ts = events.agg(F.max("ts")).first()[0]
    held_back = set(want) - set(got)
    for ws, _ in held_back:
        assert (max_ts - ws).total_seconds() <= 3 * 3600, (ws, max_ts)


def test_stream_seed_ingest_admission(spark, tmp_path):
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    (seeds_dir / "batch1.txt").write_text(
        "https://H.test/a/\nhttps://h.test/a?x=1\nhttps://h.test/b\nhttps://h.test/seen1/\n"
    )
    seen = spark.createDataFrame(
        [("https://h.test/seen1",)], "url_norm string"
    ).withColumn("url_hash", F.xxhash64("url_norm"))
    out = str(tmp_path / "frontier")
    q = stream_frontier_ingest(
        spark, str(seeds_dir), seen, str(tmp_path / "ckpt"), out
    )
    q.awaitTermination(120)
    got = sorted(r["url_norm"] for r in spark.read.parquet(out).collect())
    # /a and /a?x=1 collapse to one; seen1 is rejected by the anti-join
    assert got == ["https://h.test/a", "https://h.test/b"]


def test_stream_sessionize_stateful_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: state carried across
    micro-batches (one file per trigger) must converge to the batch
    sessionize result over the same events."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wormpy_spark.streaming.stream import stream_sessionize

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for u in range(4):
        t = base + dt.timedelta(minutes=u)
        for s in range(u + 1):             # user u has u+1 sessions
            t += dt.timedelta(seconds=1801)  # gap > 30 min → new session
            for e in range(3):              # 3 events per session
                t += dt.timedelta(seconds=60)
                rows.append({"event_id": eid, "user_id": u, "ts": t})
                eid += 1
    pdf = pd.DataFrame(rows).sort_values("ts").reset_index(drop=True)

    src = tmp_path / "events_src"
    src.mkdir()
    third = len(pdf) // 3
    for i, chunk in enumerate([pdf[:third], pdf[third : 2 * third], pdf[2 * third :]]):
        p = str(src / f"part-{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            p,
            coerce_timestamps="us",  # Spark reads µs timestamps, not ns
            allow_truncated_timestamps=True,
        )
        # FileStreamSource orders micro-batches by file mtime at MS
        # granularity: three sub-ms writes tie and the batch order is
        # then arbitrary, which violates this operator's documented
        # batch-monotonic input contract (observed once under full-suite
        # load as {1:1, 3:5}). Pin strictly increasing mtimes, as the
        # dropDuplicates test below already does.
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    q = stream_sessionize(
        spark, str(src), "event_id long, user_id long, ts timestamp",
        str(tmp_path / "sess_ckpt"),
    )
    q.awaitTermination(180)

    # final state per user = last update emitted
    out = spark.table("sessionize_out").toPandas()
    final = (
        out.sort_values("last_epoch").groupby("user_id")["n_sessions"].last()
    )
    assert {int(u): int(n) for u, n in final.items()} == {
        0: 1, 1: 2, 2: 3, 3: 4
    }


def test_stream_sessionize_group_spanning_many_arrow_chunks(spark, tmp_path):
    """Regression: a user whose micro-batch events span MULTIPLE Arrow
    chunks (group larger than arrow.maxRecordsPerBatch) must still
    count sessions correctly — chunks arrive in arbitrary (shuffle)
    order, so folding them chunk-by-chunk with per-chunk sorts lets
    last_epoch regress and overcounts."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wormpy_spark.streaming.stream import stream_sessionize

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    t = base
    for _s in range(5):                      # exactly 5 sessions
        t += dt.timedelta(seconds=1801)
        for _e in range(40):                 # 200 events total
            t += dt.timedelta(seconds=10)
            rows.append({"event_id": eid, "user_id": 7, "ts": t})
            eid += 1
    # shuffled file order → Arrow chunks are NOT chronological
    pdf = pd.DataFrame(rows).sample(frac=1.0, random_state=13).reset_index(drop=True)

    src = tmp_path / "events_src"
    src.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(src / "part-0.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "16")               # force ~13 chunks for the group
    try:
        q = stream_sessionize(
            spark, str(src), "event_id long, user_id long, ts timestamp",
            str(tmp_path / "sess_ckpt"),
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set(key, prev)

    out = spark.table("sessionize_out").toPandas()
    final = out.sort_values("last_epoch").groupby("user_id")["n_sessions"].last()
    assert {int(u): int(n) for u, n in final.items()} == {7: 5}


def test_stream_sessionize_watermarked_late_data_policy(spark, tmp_path):
    """Watermarked session_window variant: an out-of-order event inside
    the watermark horizon merges into its session; an event OLDER than
    the watermark is dropped (never resurrects a closed session); only
    watermark-closed sessions are emitted (append mode)."""
    import datetime as dt
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wormpy_spark.streaming.stream import stream_sessionize_watermarked

    def write(ix, rows):
        p = str(src / f"part-{ix}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
            p,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(p, (1_700_000_000 + ix, 1_700_000_000 + ix))  # file order

    def ev(eid, hh, mm):
        return {"event_id": eid, "user_id": 7,
                "ts": dt.datetime(2024, 5, 1, hh, mm, 0)}

    src = tmp_path / "events_src"
    src.mkdir()
    # session A: 10:00 + out-of-order 10:05 in the SAME batch → merges
    write(0, [ev(0, 10, 0), ev(1, 10, 5)])
    write(1, [ev(2, 13, 0)])   # session B; watermark advances to 12:00
    write(2, [ev(3, 16, 0)])   # session C; watermark advances to 15:00
    # LATE: 10:20 arrives with wm=15:00 and session A already finalized
    # → DROPPED (asserted via numRowsDroppedByWatermark and the output:
    # A keeps 2 events, no bogus [10:20, 10:50) session appears)
    write(3, [ev(4, 10, 20)])
    write(4, [ev(5, 20, 0)])   # flush: wm 19:00 closes C

    q = stream_sessionize_watermarked(
        spark, str(src), "event_id long, user_id long, ts timestamp",
        str(tmp_path / "wm_ckpt"), gap="30 minutes", watermark="1 hour",
    )
    q.awaitTermination(180)
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped == 1  # exactly the 10:20 straggler

    out = spark.table("sessionize_wm_out").toPandas().sort_values("session_start")
    got = [
        (r["session_start"].hour, r["session_start"].minute, int(r["n_events"]))
        for _, r in out.iterrows()
    ]
    # A = {10:00, 10:05} (late 10:20 dropped, never resurrects A),
    # B = {13:00}, C = {16:00}; the 20:00 session is still inside the
    # trailing watermark horizon and therefore unemitted
    assert got == [(10, 0, 2), (13, 0, 1), (16, 0, 1)]


def test_stream_dedup_exact_drops_cross_batch_duplicates(spark, tmp_path):
    """Rows with a key already emitted in an earlier micro-batch (and
    within the watermark horizon) are dropped; the surviving key set
    equals the batch distinct. Duplicate rows are byte-identical so the
    survivor is unambiguous."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wormpy_spark.streaming.stream import stream_dedup_exact

    src = tmp_path / "src"
    src.mkdir()
    base = 1_700_000_000_000_000  # us epoch

    def write_batch(name, rows):
        pq.write_table(
            pa.table(
                {
                    "fingerprint": pa.array([r[0] for r in rows], pa.string()),
                    "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [base + r[2] * 1_000_000 for r in rows],
                        pa.timestamp("us"),
                    ),
                }
            ),
            str(src / name),
        )

    # batch 1: keys a,b,c (b duplicated in-batch)
    write_batch("b1.parquet", [("a", 1, 0), ("b", 2, 1), ("b", 2, 1), ("c", 3, 2)])
    out = tmp_path / "out"
    q = stream_dedup_exact(
        spark, str(src), "fingerprint string, doc_id long, ts timestamp",
        str(tmp_path / "ck"), str(out),
    )
    q.awaitTermination(120)
    # batch 2: b,c again (cross-batch dups) + new d, all within watermark
    write_batch("b2.parquet", [("b", 2, 3), ("c", 3, 4), ("d", 4, 5)])
    q2 = stream_dedup_exact(
        spark, str(src), "fingerprint string, doc_id long, ts timestamp",
        str(tmp_path / "ck"), str(out),
    )
    q2.awaitTermination(120)

    got = spark.read.parquet(str(out))
    keys = sorted(r["fingerprint"] for r in got.collect())
    assert keys == ["a", "b", "c", "d"], keys  # each exactly once
