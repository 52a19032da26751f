"""Streaming-equals-batch replay tests (spark_nnd_spark/streaming).

Each streaming operator drains the sf0.001 events file with
trigger(availableNow=True) into a memory sink and must reproduce its
batch twin exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_nnd_spark.operators import events as EV
from spark_nnd_spark.sources import load_table
from spark_nnd_spark.streaming import (
    read_events_stream,
    run_to_memory_sink,
    sessionize_stream,
    user_running_totals_stream,
    windowed_counts_stream,
)
from tests.conftest import SF_SMOKE



pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_stream_source_schema(spark, events_batch):
    s = read_events_stream(spark, SF_SMOKE)
    assert s.isStreaming
    assert s.schema == events_batch.schema


def test_windowed_counts_match_batch(spark, events_batch):
    stream = windowed_counts_stream(read_events_stream(spark, SF_SMOKE))
    run_to_memory_sink(stream, "wc", output_mode="complete")
    got = {
        (r["w_start_epoch"], r["event_type"]): (r["c"], r["v"])
        for r in spark.sql("SELECT * FROM wc").collect()
    }
    want = {
        (r["w_start_epoch"], r["event_type"]): (r["c"], r["v"])
        for r in events_batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("string").alias("v"),
        )
        .select(F.col("w.start").cast("long").alias("w_start_epoch"), "event_type", "c", "v")
        .collect()
    }
    assert got == want and len(got) > 0


def test_sessionize_matches_batch(spark, events_batch):
    stream = sessionize_stream(read_events_stream(spark, SF_SMOKE), gap_minutes=30)
    run_to_memory_sink(stream, "sess", output_mode="complete")
    got = {
        (r["user_id"], r["t_start_epoch"]): (r["n_events"], r["t_end_epoch"])
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    want = {
        (r["user_id"], r["t_start"]): (r["n_events"], r["t_end"])
        for r in EV.sessionize(events_batch, gap_minutes=30)
        .select(
            "user_id",
            "n_events",
            F.col("t_start").cast("long").alias("t_start"),
            F.col("t_end").cast("long").alias("t_end"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_running_totals_final_state_matches_batch(spark, events_batch):
    stream = user_running_totals_stream(read_events_stream(spark, SF_SMOKE))
    run_to_memory_sink(stream, "tot", output_mode="update")
    # update mode emits one row per user per micro-batch; the final row
    # per user is the folded state
    got = {
        r["user_id"]: (r["n_events"], r["total"])
        for r in spark.sql(
            """SELECT user_id, n_events, total FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                              ORDER BY n_events DESC) rn FROM tot
               ) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], f"{r['tot']:.2f}")
        for r in events_batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tot"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        # float fold order differs stream vs batch; totals agree to cents
        assert abs(float(got[u][1]) - float(want[u][1])) < 0.05


def test_dedup_stream_keeps_one_per_key(spark, events_batch):
    from spark_nnd_spark.streaming.streams import dedup_stream

    stream = read_events_stream(spark, SF_SMOKE)
    run_to_memory_sink(dedup_stream(stream), "dedup_sink", output_mode="append")
    rows = spark.sql("SELECT * FROM dedup_sink").collect()
    got_keys = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(got_keys) == len(set(got_keys))  # one row per key
    want = {
        (r["user_id"], r["event_type"])
        for r in events_batch.select("user_id", "event_type").distinct().collect()
    }
    assert set(got_keys) == want  # every key represented


def test_quality_filter_stream_matches_batch(spark):
    from spark_nnd_spark.queries.pipeline import q37_quality_filter
    from spark_nnd_spark.streaming.streams import quality_filter_stream, read_documents_stream

    stream = quality_filter_stream(read_documents_stream(spark, SF_SMOKE))
    run_to_memory_sink(stream, "qf", output_mode="append")
    got = {
        r["doc_id"]: (r["n_tokens"], r["stopword_ratio"], r["type_token_ratio"], r["keep"])
        for r in spark.sql("SELECT * FROM qf").collect()
    }
    want = {
        r["doc_id"]: (r["n_tokens"], r["stopword_ratio"], r["type_token_ratio"], r["keep"])
        for r in q37_quality_filter(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_chunk_stream_matches_batch(spark):
    """Stateless chunk fan-out at ingest == the q186 batch export
    (same operator, so drift is structurally impossible — this pins
    the streaming plumbing: schema, generator under microbatch)."""
    from spark_nnd_spark.operators.sampling import chunk_tokens
    from spark_nnd_spark.streaming.streams import (
        chunk_stream,
        read_documents_stream,
    )

    stream = chunk_stream(read_documents_stream(spark, SF_SMOKE))
    run_to_memory_sink(stream, "chk", output_mode="append")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in spark.sql("SELECT * FROM chk").collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_tokens(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_kafka_source_gated_with_clear_error(spark):
    from spark_nnd_spark.streaming.streams import read_events_kafka

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_events_kafka(spark, "localhost:9092", "events")


def test_attribution_stream_matches_batch(spark, events_batch):
    """Stream-stream interval join replays the batch join exactly."""
    from spark_nnd_spark.streaming import attribution_stream

    clicks_s = read_events_stream(spark, SF_SMOKE).filter(
        F.col("event_type") == "click"
    )
    purchases_s = read_events_stream(spark, SF_SMOKE).filter(
        F.col("event_type") == "purchase"
    )
    out = attribution_stream(clicks_s, purchases_s, horizon="30 minutes")
    q = run_to_memory_sink(out, "attrib_test", output_mode="append")
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attrib_test").collect()
    }

    c = events_batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = events_batch.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            F.expr(
                "c_user_id = user_id AND click_ts <= purchase_ts"
                " AND click_ts >= purchase_ts - INTERVAL 30 minutes"
            ),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_file_sink_exactly_once_across_restart(spark, tmp_path):
    """The production sink contract: a query restarted from the same
    checkpoint resumes at the first unprocessed input file and never
    re-emits committed rows — output equals the batch twin with zero
    duplicates, and an idle restart writes nothing."""
    import pyarrow.parquet as pq

    from spark_nnd_spark.streaming import run_to_parquet_sink

    tbl = pq.read_table(f"{SF_SMOKE}/events.parquet")
    half = tbl.num_rows // 2
    indir = tmp_path / "in"
    indir.mkdir()
    pq.write_table(tbl.slice(0, half), indir / "part1.parquet")
    schema = spark.read.parquet(str(indir / "part1.parquet")).schema
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        s = spark.readStream.schema(schema).parquet(str(indir))
        run_to_parquet_sink(s.filter(F.col("value") > 0), out, ckpt)

    drain()
    n_first = spark.read.parquet(out).count()
    assert n_first > 0

    # late files land; restart from the same checkpoint
    pq.write_table(tbl.slice(half), indir / "part2.parquet")
    drain()
    got = spark.read.parquet(out)
    want = spark.read.parquet(str(indir)).filter(F.col("value") > 0)
    assert got.count() == want.count() > n_first
    assert got.select("event_id").distinct().count() == got.count()

    # idle restart: no new input, no new rows
    drain()
    assert spark.read.parquet(out).count() == want.count()


def test_anomaly_stream_matches_batch(spark, events_batch):
    """Stream-static join: scoring the replayed stream against the
    batch-computed per-type stats snapshot flags exactly the events the
    batch q84 flags (broadcast static side, stateless stream)."""
    from spark_nnd_spark.queries.pipeline import q84_event_anomaly
    from spark_nnd_spark.streaming.streams import anomaly_stream

    stats = events_batch.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    stream = anomaly_stream(read_events_stream(spark, SF_SMOKE), stats)
    run_to_memory_sink(stream, "anom", output_mode="append")
    got = {
        r["event_id"]: r["event_type"]
        for r in spark.sql("SELECT * FROM anom").collect()
    }
    want = {
        r["event_id"]: r["event_type"]
        for r in q84_event_anomaly(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_transitions_stream_deltas_sum_to_batch(spark, events_batch):
    from spark_nnd_spark.streaming.streams import transitions_stream

    stream = transitions_stream(read_events_stream(spark, SF_SMOKE))
    run_to_memory_sink(stream, "trans", output_mode="update")
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in spark.sql(
            """SELECT prev_type, next_type, SUM(delta) AS n
               FROM trans GROUP BY 1, 2"""
        ).collect()
    }
    want = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in EV.type_transitions(events_batch)
        .select("prev_type", "next_type", "n")
        .collect()
    }
    assert got == want and len(got) > 0


def test_transitions_stream_state_straddles_batches(spark, events_batch, tmp_path):
    """Split the event log into 3 time-ordered files processed one per
    micro-batch (maxFilesPerTrigger=1): transitions straddling batch
    boundaries must still be counted exactly once via the carried
    last-event state."""
    import os

    from spark_nnd_spark.streaming.streams import transitions_stream

    d = tmp_path / "ev_chunks"
    d.mkdir()
    pdf = (
        events_batch.select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        p = d / f"chunk{i}.parquet"
        pdf.iloc[cuts[i] : cuts[i + 1]].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))  # file order = time order
    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    run_to_memory_sink(transitions_stream(stream), "trans3", output_mode="update")
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in spark.sql(
            "SELECT prev_type, next_type, SUM(delta) AS n FROM trans3 GROUP BY 1, 2"
        ).collect()
    }
    want = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in EV.type_transitions(events_batch)
        .select("prev_type", "next_type", "n")
        .collect()
    }
    assert got == want and len(got) > 0


class _FakeState:
    """Minimal GroupState stand-in for kernel-level unit tests."""

    def __init__(self, value=None):
        self._value = value

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value


def _run_kernel(chunks, state):
    import pandas as pd

    from spark_nnd_spark.streaming.streams import _transitions_fn

    out = list(_transitions_fn((7,), iter(chunks), state))
    if not out:
        return {}
    pdf = pd.concat(out, ignore_index=True)
    return {
        (r.prev_type, r.next_type): int(r.delta) for r in pdf.itertuples()
    }


def test_transitions_kernel_sorts_across_arrow_chunks():
    """applyInPandasWithState may split one group's micro-batch across
    several Arrow chunks in arbitrary order; transitions crossing a
    chunk boundary must be computed on the globally sorted sequence,
    not per-chunk."""
    import pandas as pd

    # global (ts, event_id) order: a(1) b(2) c(3) d(4) — delivered as
    # two interleaved, unsorted chunks {c, a} and {d, b}
    chunk1 = pd.DataFrame(
        {"user_id": [7, 7], "ts": [3, 1], "event_id": [3, 1],
         "event_type": ["c", "a"]}
    )
    chunk2 = pd.DataFrame(
        {"user_id": [7, 7], "ts": [4, 2], "event_id": [4, 2],
         "event_type": ["d", "b"]}
    )
    state = _FakeState()
    got = _run_kernel([chunk1, chunk2], state)
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1}
    assert state.get == ("d", 4, 4)


def test_transitions_kernel_orders_straggler_against_carried_event():
    """An event arriving in a later micro-batch with a smaller
    (ts, event_id) than the carried last event must be ordered BEFORE
    it — the carried event is merged at its true event-time position."""
    import pandas as pd

    state = _FakeState(("x", 10, 10))
    batch = pd.DataFrame(
        {"user_id": [7, 7], "ts": [5, 20], "event_id": [5, 20],
         "event_type": ["early", "late"]}
    )
    got = _run_kernel([batch], state)
    # true order: early(5) x(10) late(20) → early→x and x→late;
    # NOT x→early (which naive front-insertion would produce)
    assert got == {("early", "x"): 1, ("x", "late"): 1}
    assert state.get == ("late", 20, 20)


def test_transitions_kernel_keeps_carried_event_when_all_rows_precede_it():
    import pandas as pd

    state = _FakeState(("x", 100, 100))
    batch = pd.DataFrame(
        {"user_id": [7, 7], "ts": [1, 2], "event_id": [1, 2],
         "event_type": ["a", "b"]}
    )
    got = _run_kernel([batch], state)
    # order: a(1) b(2) x(100) → a→b (adjacent new rows) and b→x
    assert got == {("a", "b"): 1, ("b", "x"): 1}
    # the carried event is still the user's last — state must not regress
    assert state.get == ("x", 100, 100)


def test_indexed_dedup_stream_replays_batch_verdicts(spark, tmp_path):
    """Stream the batch side in 3 micro-batches through the persisted
    near-dup index: the union of per-batch verdicts must equal one
    batch probe of the whole side (verdicts are per-doc pure functions
    of (doc, index) when uncapped)."""
    import os

    from pyspark.sql import functions as F

    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        neardup_query_index,
    )
    from spark_nnd_spark.sources import load_table
    from spark_nnd_spark.streaming.streams import indexed_dedup_stream

    d = load_table(spark, SF_SMOKE, "documents")
    idx = str(tmp_path / "ndidx")
    build_neardup_index(d.filter(F.col("source") != "src0"), idx)

    batch_side = d.filter(F.col("source") == "src0").select("doc_id", "text")
    src = tmp_path / "incoming"
    src.mkdir()
    pdf = batch_side.toPandas().sort_values("doc_id").reset_index(drop=True)
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        p = src / f"chunk{i}.parquet"
        pdf.iloc[cuts[i] : cuts[i + 1]].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = str(tmp_path / "verdicts")
    indexed_dedup_stream(
        stream, idx, out, checkpoint=str(tmp_path / "ckpt")
    )
    got = sorted(
        (r["doc_id"], r["verdict"])
        for r in spark.read.parquet(out).select("doc_id", "verdict").collect()
    )
    want = sorted(
        (r["doc_id"], r["verdict"])
        for r in neardup_query_index(spark, idx, batch_side).collect()
    )
    assert got == want and len(got) == n > 0
    # one output directory per micro-batch (idempotence key)
    assert len([p for p in os.listdir(out) if p.startswith("ingest_batch=")]) == 3


def test_scd2_stream_closed_intervals_match_batch(spark, events_batch):
    """Single-drain replay: emitted interval-close rows must equal the
    batch SCD2 operator's closed intervals (valid_to IS NOT NULL)."""
    from spark_nnd_spark.streaming.streams import scd2_stream

    stream = scd2_stream(read_events_stream(spark, SF_SMOKE))
    run_to_memory_sink(stream, "scd2s", output_mode="update")
    got = {
        (r["user_id"], r["version"]): (
            r["status"], r["valid_from"], r["valid_to"], r["n_events"]
        )
        for r in spark.sql("SELECT * FROM scd2s").collect()
    }
    want = {
        (r["user_id"], r["version"]): (
            r["status"],
            r["valid_from"].timestamp().__trunc__(),
            r["valid_to"].timestamp().__trunc__(),
            r["n_events"],
        )
        for r in EV.scd2_intervals(events_batch)
        .filter(F.col("valid_to").isNotNull())
        .collect()
    }
    assert got == want and len(got) > 0


def test_scd2_stream_state_straddles_batches(spark, events_batch, tmp_path):
    """3 time-ordered micro-batches: an interval spanning a batch
    boundary must close exactly once with the merged event count, and
    versions must stay dense per user."""
    import os

    from spark_nnd_spark.streaming.streams import scd2_stream

    d = tmp_path / "scd2_chunks"
    d.mkdir()
    pdf = (
        events_batch.select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        p = d / f"chunk{i}.parquet"
        pdf.iloc[cuts[i] : cuts[i + 1]].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    run_to_memory_sink(scd2_stream(stream), "scd2s3", output_mode="update")
    rows = spark.sql("SELECT * FROM scd2s3").collect()
    got = {
        (r["user_id"], r["version"]): (
            r["status"], r["valid_from"], r["valid_to"], r["n_events"]
        )
        for r in rows
    }
    assert len(got) == len(rows), "an interval closed twice"
    want = {
        (r["user_id"], r["version"]): (
            r["status"],
            r["valid_from"].timestamp().__trunc__(),
            r["valid_to"].timestamp().__trunc__(),
            r["n_events"],
        )
        for r in EV.scd2_intervals(events_batch)
        .filter(F.col("valid_to").isNotNull())
        .collect()
    }
    assert got == want


def test_hopping_counts_stream_matches_batch(spark, events_batch):
    """Hopping twin: windowed_counts_stream(slide=1h, window=2h) must
    reproduce the batch hopping operator exactly."""
    from spark_nnd_spark.operators.events import hopping_counts
    from spark_nnd_spark.streaming.streams import windowed_counts_stream

    stream = windowed_counts_stream(
        read_events_stream(spark, SF_SMOKE), window="2 hours", slide="1 hour"
    )
    run_to_memory_sink(stream, "hop", output_mode="complete")
    got = {
        (r["w_start_epoch"], r["event_type"]): (r["c"], r["v"])
        for r in spark.sql("SELECT * FROM hop").collect()
    }
    want = {
        (r["w_start"].timestamp().__trunc__(), r["event_type"]): (r["c"], r["v"])
        for r in hopping_counts(events_batch, size_hours=2, slide_hours=1).collect()
    }
    assert got == want and len(got) > 0


def test_cms_sketch_stream_matches_batch(spark):
    """Streaming CMS replay: draining the document stream must produce
    the exact batch sketch cell table (bounded O(DEPTH*WIDTH) state)."""
    from spark_nnd_spark.functions.text import token_hash_lambda, tokens_expr
    from spark_nnd_spark.operators.sketches import cms_sketch
    from spark_nnd_spark.streaming.streams import (
        cms_sketch_stream,
        read_documents_stream,
    )

    stream = cms_sketch_stream(read_documents_stream(spark, SF_SMOKE))
    run_to_memory_sink(stream, "cms", output_mode="complete")
    got = {
        (r["row"], r["col"]): r["n"] for r in spark.sql("SELECT * FROM cms").collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    hashed = docs.select(F.explode(tokens_expr("text")).alias("token")).select(
        token_hash_lambda(F.col("token")).alias("h")
    )
    want = {(r["row"], r["col"]): r["n"] for r in cms_sketch(hashed, "h").collect()}
    assert got == want and len(got) > 0


def test_last_seen_stream_evicts_idle_users(spark, events_batch, tmp_path):
    """Event-time eviction contract: draining the event log split into
    4 time-ordered micro-batches must (a) emit an active row for every
    user, (b) emit at most one tombstone per user, (c) tombstone ONLY
    users whose last event sits more than the 30-min idle horizon
    before the final watermark, and (d) every tombstone's last_seen
    matches the user's true final event time (state held the full
    history before eviction)."""
    import os

    from spark_nnd_spark.streaming.streams import _IDLE_MS, user_last_seen_stream

    d = tmp_path / "seen_chunks"
    d.mkdir()
    pdf = (
        events_batch.select("user_id", "ts", "event_id")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    n = len(pdf)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        p = d / f"chunk{i}.parquet"
        # microsecond timestamps: the session-wide nanosAsLong conf
        # (set by read_events_stream) makes ns timestamps read as
        # BIGINT, which a watermark rejects
        pdf.iloc[cuts[i] : cuts[i + 1]].to_parquet(
            p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    run_to_memory_sink(user_last_seen_stream(stream), "seen", output_mode="update")
    rows = spark.sql("SELECT * FROM seen").collect()
    active_users = {r["user_id"] for r in rows if r["active"]}
    tombs = [r for r in rows if not r["active"]]

    true_last = {
        r["user_id"]: r["m"]
        for r in events_batch.groupBy("user_id")
        .agg(F.max(F.col("ts").cast("long")).alias("m"))
        .collect()
    }
    assert active_users == set(true_last), "every user must appear active once"
    assert len({r["user_id"] for r in tombs}) == len(tombs), "one tombstone max"
    assert tombs, "the event log has multi-hour gaps; some users must evict"

    # availableNow runs a final timeout sweep after the last data
    # batch, with the watermark at end-of-stream max ts minus the
    # 10-min delay: exactly the users idle past the horizon evict
    final_wm = int(pdf["ts"].max().timestamp()) - 600
    horizon = _IDLE_MS // 1000
    for r in tombs:
        assert r["last_seen"] + horizon <= final_wm, r
        assert r["last_seen"] == true_last[r["user_id"]], r
    # and ONLY those: every idle-past-horizon user must have evicted
    should_evict = {u for u, m in true_last.items() if m + horizon <= final_wm}
    assert {r["user_id"] for r in tombs} == should_evict
    assert should_evict != set(true_last), "the freshest users must survive"


def test_indexed_dedup_stream_admit_closes_ingest_loop(spark, tmp_path):
    """probe→admit→extend: with admit_novel=True, batch N+1's verdicts
    must reflect batch N's admissions — an exact re-send of a batch-0
    novel doc reads 'exact' and a near-dup of one reads 'near', which
    an un-admitting index can never produce. Then a full reprocess
    (fresh checkpoint, same files, same already-extended index) must
    land the SAME verdicts: batchId markers skip replayed batches, and
    the exclude_ids probe purity means even a marker-less re-probe of
    an already-admitted batch reproduces its original verdicts."""
    import os

    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        neardup_query_index,
    )
    from spark_nnd_spark.streaming.streams import indexed_dedup_stream

    base_words = [f"w{i:03d}" for i in range(40)]

    def text(seed: int, edits: int = 0) -> str:
        toks = [f"t{seed}_{w}" for w in base_words]
        for e in range(edits):
            toks[5 + 7 * e] = f"edit{seed}_{e}"
        return " ".join(toks)

    base = spark.createDataFrame(
        [(i, text(i)) for i in range(10)], "doc_id long, text string"
    )
    idx = str(tmp_path / "ndidx")
    build_neardup_index(base, idx)

    # batch 0: two novel docs; batch 1: an exact copy of doc 1001, a
    # near-dup (1 token edit, shingle-Jaccard ~0.85 — banding finds it
    # deterministically for this fixed text) of doc 1002, and a fresh
    # novel doc
    b0 = [(1001, text(101)), (1002, text(102))]
    b1 = [(2001, text(101)), (2002, text(102, edits=1)), (2003, text(103))]
    src = tmp_path / "incoming"
    src.mkdir()
    import pandas as pd

    for i, rows in enumerate([b0, b1]):
        p = src / f"chunk{i}.parquet"
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    schema = spark.read.parquet(str(src)).schema
    out = str(tmp_path / "verdicts")

    def run(ckpt: str) -> dict[int, str]:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        indexed_dedup_stream(
            stream, idx, out, checkpoint=str(tmp_path / ckpt), admit_novel=True
        )
        return {
            r["doc_id"]: r["verdict"] for r in spark.read.parquet(out).collect()
        }

    got = run("ckpt1")
    want = {1001: "novel", 1002: "novel", 2001: "exact", 2002: "near", 2003: "novel"}
    assert got == want
    # all five novel docs were admitted (base 10 + 1001,1002 + 2003)
    n_digests = spark.read.parquet(f"{idx}/digests").count()
    assert n_digests == 13
    assert sorted(
        p for p in os.listdir(f"{idx}/admitted") if p.startswith("ingest_batch=")
    ) == ["ingest_batch=0", "ingest_batch=1"]

    # reprocess from scratch against the EXTENDED index: markers skip
    # both batches — verdicts unchanged, index not double-extended
    got2 = run("ckpt2")
    assert got2 == want
    assert spark.read.parquet(f"{idx}/digests").count() == n_digests

    # exclude_ids purity (the crash-window guarantee): re-probing an
    # already-admitted batch with its own ids excluded reproduces the
    # original verdicts; without exclusion the docs match themselves
    b0_df = spark.createDataFrame(b0, "doc_id long, text string")
    pure = {
        r["doc_id"]: r["verdict"]
        for r in neardup_query_index(
            spark, idx, b0_df, exclude_ids=b0_df.select("doc_id")
        ).collect()
    }
    assert pure == {1001: "novel", 1002: "novel"}
    polluted = {
        r["doc_id"]: r["verdict"]
        for r in neardup_query_index(spark, idx, b0_df).collect()
    }
    assert polluted == {1001: "exact", 1002: "exact"}


def test_indexed_dedup_stream_with_midstream_retraction(spark, tmp_path):
    """Retraction composes with the streaming ingest loop: a doc
    admitted by batch 0 and then RETRACTED must stop producing 'near'
    verdicts (the tombstone anti-join reaches the streaming probe),
    and a later batch re-ingesting the same doc_id with new content
    upserts it — tombstone cleared, old rows purged, the new content
    matchable again."""
    import os

    import pandas as pd

    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        neardup_query_index,
        retract_from_neardup_index,
    )
    from spark_nnd_spark.streaming.streams import indexed_dedup_stream

    base_words = [f"w{i:03d}" for i in range(40)]

    def text(seed: int, edits: int = 0) -> str:
        toks = [f"t{seed}_{w}" for w in base_words]
        for e in range(edits):
            toks[5 + 7 * e] = f"edit{seed}_{e}"
        return " ".join(toks)

    base = spark.createDataFrame(
        [(i, text(i)) for i in range(10)], "doc_id long, text string"
    )
    idx = str(tmp_path / "ndidx")
    build_neardup_index(base, idx)

    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "verdicts")
    schema = "doc_id long, text string"

    def push(i: int, rows) -> None:
        p = src / f"chunk{i}.parquet"
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    def run() -> dict[int, str]:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        indexed_dedup_stream(
            stream, idx, out, checkpoint=str(tmp_path / "ckpt"), admit_novel=True
        )
        return {
            r["doc_id"]: r["verdict"] for r in spark.read.parquet(out).collect()
        }

    push(0, [(1001, text(101))])
    got = run()
    assert got[1001] == "novel"  # admitted

    retract_from_neardup_index(spark, idx, base.sparkSession.createDataFrame(
        [(1001,)], "doc_id long"
    ))

    # near-dup of the retracted doc: 'near' without retraction, must
    # now read 'novel'; an exact copy of an UNRETRACTED base doc still
    # reads 'exact'
    push(1, [(2001, text(101, edits=1)), (2002, text(3))])
    got = run()
    assert got[2001] == "novel" and got[2002] == "exact"

    # re-ingest the retracted id with NEW content: novel -> admitted ->
    # upsert (tombstone cleared, old rows purged)
    push(2, [(1001, text(201))])
    got = run()
    assert got[1001] == "novel"
    assert not os.path.isdir(f"{idx}/tombstones")
    dig = spark.read.parquet(f"{idx}/digests")
    rows_1001 = dig.filter(F.col("doc_id") == 1001).collect()
    assert len(rows_1001) == 1  # old content purged, new appended once
    # the re-admitted content is matchable again (exact copy — digest
    # matching is banding-independent; a 1-edit near-dup of this
    # particular text happens to miss all 4 LSH bands, the known
    # per-fixture banding lottery)
    probe = spark.createDataFrame([(3001, text(201))], schema)
    final = {
        r["doc_id"]: r["verdict"]
        for r in neardup_query_index(spark, idx, probe).collect()
    }
    assert final == {3001: "exact"}


def test_token_histogram_stream_matches_batch_cells(spark):
    """Drained histogram stream == batch fixed_histogram cell-for-cell
    (cells merge across micro-batches by addition — the sketch's
    mergeability is what makes the streaming state bounded)."""
    from spark_nnd_spark.functions import text as TX
    from spark_nnd_spark.operators.sketches import fixed_histogram
    from spark_nnd_spark.streaming.streams import (
        read_documents_stream,
        token_histogram_stream,
    )

    stream = token_histogram_stream(read_documents_stream(spark, SF_SMOKE))
    run_to_memory_sink(stream, "hist_cells", output_mode="complete")
    got = {
        (r["source"], r["bin"]): r["cnt"]
        for r in spark.sql("SELECT * FROM hist_cells").collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    want = {
        (r["grp"], r["bin"]): r["cnt"]
        for r in fixed_histogram(
            docs, "source", TX.token_count_expr("text"), 0.0, 8.0, 64
        ).collect()
    }
    assert got == want and len(got) > 0


def test_exact_sample_stream_matches_batch_sample(spark):
    """The final per-group emission of the streaming exact-k sampler
    must equal the batch per_group_exact_sample over the full drained
    input — top-k-by-key is associative, so micro-batching cannot
    change the sample. Exercised across multiple micro-batches."""
    from spark_nnd_spark.operators.sampling import per_group_exact_sample
    from spark_nnd_spark.streaming.streams import (
        exact_sample_stream,
        read_documents_stream,
    )

    import os

    docs = load_table(spark, SF_SMOKE, "documents")
    # split into 3 files + maxFilesPerTrigger=1 so the fold genuinely
    # crosses micro-batch boundaries (the single-file source drains in
    # one batch, which would not exercise the carried state)
    import tempfile

    src_dir = tempfile.mkdtemp(prefix="xs_src_")
    pdf = docs.select("source", "doc_id").toPandas().sort_values("doc_id")
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        f = os.path.join(src_dir, f"chunk{i}.parquet")
        pdf.iloc[cuts[i] : cuts[i + 1]].to_parquet(f, index=False)
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    schema = spark.read.parquet(src_dir).schema
    stream_src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    stream = exact_sample_stream(stream_src, k=5)
    run_to_memory_sink(stream, "xs", output_mode="update")
    got = {
        (r["grp"], r["doc_id"])
        for r in spark.sql(
            """SELECT grp, doc_id FROM xs x
               WHERE n_seen = (SELECT MAX(n_seen) FROM xs y WHERE y.grp = x.grp)"""
        ).collect()
    }
    want = {
        (r["source"], r["doc_id"])
        for r in per_group_exact_sample(docs, "source", k=5).collect()
    }
    assert got == want and len(got) > 0
    # bounded state: every emission is exactly min(k, n_seen) rows
    per_emit = spark.sql(
        "SELECT grp, n_seen, COUNT(*) AS c FROM xs GROUP BY grp, n_seen"
    ).collect()
    assert all(r["c"] <= 5 for r in per_emit)


def test_retraction_stream_composes_with_ingest_loop(spark, tmp_path):
    """The retract STREAM beside the admit stream: a doc admitted by
    ingest batch 0 and retracted by the retraction stream must stop
    matching in the next ingest batch (near-dup reads 'novel'), and
    replaying the retraction stream from a fresh checkpoint only
    appends duplicate tombstones — semantic no-ops, verdicts and
    probe results unchanged."""
    import os

    import pandas as pd

    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        neardup_query_index,
    )
    from spark_nnd_spark.streaming.streams import (
        indexed_dedup_stream,
        retraction_stream,
    )

    base_words = [f"w{i:03d}" for i in range(40)]

    def text(seed: int, edits: int = 0) -> str:
        toks = [f"t{seed}_{w}" for w in base_words]
        for e in range(edits):
            toks[5 + 7 * e] = f"edit{seed}_{e}"
        return " ".join(toks)

    base = spark.createDataFrame(
        [(i, text(i)) for i in range(10)], "doc_id long, text string"
    )
    idx = str(tmp_path / "ndidx")
    build_neardup_index(base, idx)

    doc_src = tmp_path / "incoming"
    doc_src.mkdir()
    rtr_src = tmp_path / "retractions"
    rtr_src.mkdir()
    out = str(tmp_path / "verdicts")

    def push(d, i: int, rows, cols) -> None:
        p = d / f"chunk{i}.parquet"
        pd.DataFrame(rows, columns=cols).to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    def run_ingest() -> dict[int, str]:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(doc_src))
        )
        indexed_dedup_stream(
            stream, idx, out, checkpoint=str(tmp_path / "ckpt"), admit_novel=True
        )
        return {
            r["doc_id"]: r["verdict"] for r in spark.read.parquet(out).collect()
        }

    def run_retract(ckpt: str) -> None:
        stream = spark.readStream.schema("doc_id long").parquet(str(rtr_src))
        retraction_stream(stream, idx, checkpoint=str(tmp_path / ckpt))

    # batch 0: doc 1001 is novel and gets admitted
    push(doc_src, 0, [(1001, text(101))], ["doc_id", "text"])
    assert run_ingest()[1001] == "novel"
    near = spark.createDataFrame(
        [(3001, text(101, edits=1))], "doc_id long, text string"
    )
    assert (
        neardup_query_index(spark, idx, near, max_band_freq=None)
        .collect()[0]["verdict"]
        == "near"  # admitted and matchable pre-retraction
    )

    # retraction batch: forget doc 1001
    push(rtr_src, 0, [(1001,)], ["doc_id"])
    run_retract("rckpt1")

    # replay the retraction stream from a fresh checkpoint BEFORE the
    # next ingest batch: duplicate tombstones are appended but are
    # semantic no-ops — the tombstone SET is unchanged and the log is
    # append-only (no marker needed, unlike admission)
    tomb_before = spark.read.parquet(f"{idx}/tombstones")
    n_rows_before = tomb_before.count()
    ids_before = {r["id"] for r in tomb_before.distinct().collect()}
    assert ids_before == {1001}
    run_retract("rckpt2")
    tomb_after = spark.read.parquet(f"{idx}/tombstones")
    assert {r["id"] for r in tomb_after.distinct().collect()} == ids_before
    assert tomb_after.count() >= n_rows_before  # append-only log

    # next ingest batch (after retraction + its replay): the near-dup
    # of the retracted doc must now read 'novel' (and get admitted
    # itself); an exact copy of an UNRETRACTED base doc still reads
    # 'exact'
    push(doc_src, 1, [(3001, text(101, edits=1)), (3002, text(5))], ["doc_id", "text"])
    got = run_ingest()
    assert got[3001] == "novel"
    assert got[3002] == "exact"


def test_indexed_ann_stream_replay_equals_batch(spark, tmp_path):
    """Streaming vector search against the persisted IVF index: the
    union of per-micro-batch top-k results must equal one batch probe
    of all queries (the probe is a pure function of (query, index)),
    and a full reprocess from a fresh checkpoint rewrites identical
    rows into the same batchId-keyed directories."""
    import os

    import numpy as np
    import pandas as pd

    from spark_nnd_spark.operators.similarity import (
        ann_ivf_query_index,
        build_ivf_index,
        fixed_centroids,
    )
    from spark_nnd_spark.streaming.streams import indexed_ann_stream

    rng = np.random.default_rng(7)
    dim = 16
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "ivfidx")
    build_ivf_index(
        corpus, idx, n_centroids=8, centroids=fixed_centroids(dim, 8, 7)
    )

    qvecs = [
        (1000 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(6)
    ]
    src = tmp_path / "queries"
    src.mkdir()
    for b in range(2):  # two micro-batches of three queries
        p = src / f"chunk{b}.parquet"
        pd.DataFrame(qvecs[3 * b : 3 * b + 3], columns=["vec_id", "embedding"]).to_parquet(
            p, index=False
        )
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))
    out = str(tmp_path / "annout")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        indexed_ann_stream(stream, idx, out, checkpoint=str(tmp_path / ckpt))
        return sorted(
            (r["query_id"], r["rank"], r["nb_id"], round(r["cosine"], 9))
            for r in spark.read.parquet(out).collect()
        )

    streamed = run("ck1")
    assert sorted(
        p for p in os.listdir(out) if p.startswith("ann_batch=")
    ) == ["ann_batch=0", "ann_batch=1"]

    all_q = spark.createDataFrame(qvecs, "vec_id long, embedding array<double>")
    batch = sorted(
        (r["query_id"], r["rank"], r["nb_id"], round(r["cosine"], 9))
        for r in ann_ivf_query_index(spark, idx, all_q).collect()
    )
    assert streamed == batch
    assert len(streamed) == 6 * 5  # k=5 per query

    # full reprocess, fresh checkpoint: same directories, same rows
    assert run("ck2") == batch


def test_decontam_gate_stream_rejects_planted_neardup_every_replay(spark, tmp_path):
    """Streaming leakage guard (the ingest twin of q148): a planted
    near-dup of an eval vector is rejected in every micro-batch run AND
    in a full reprocess from a fresh checkpoint; clean candidates are
    admitted; per-batch verdicts equal both the index-served batch
    probe and the inline cross_decontaminate over the same eval set."""
    import os

    import numpy as np
    import pandas as pd

    from spark_nnd_spark.operators.similarity import (
        build_ivf_index,
        cross_decontaminate,
        decontaminate_query_index,
        fixed_centroids,
    )
    from spark_nnd_spark.streaming.streams import decontam_gate_stream

    rng = np.random.default_rng(11)
    dim = 16
    cents = fixed_centroids(dim, 8, 11)
    eval_rows = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(40)]
    eval_df = spark.createDataFrame(eval_rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "evalidx")
    build_ivf_index(eval_df, idx, n_centroids=8, centroids=cents)

    # candidates: 5 random (clean w.h.p. at tau=0.95) + one planted
    # paraphrase of eval vec 3 (tiny perturbation, cosine ~0.9999)
    plant = [x + 1e-3 for x in eval_rows[3][1]]
    cands = [
        (2000 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(5)
    ] + [(2999, plant)]
    src = tmp_path / "cands"
    src.mkdir()
    for b in range(2):  # two micro-batches of three candidates
        p = src / f"chunk{b}.parquet"
        pd.DataFrame(
            cands[3 * b : 3 * b + 3], columns=["vec_id", "embedding"]
        ).to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))
    out = str(tmp_path / "gateout")
    TAU = 0.95

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        decontam_gate_stream(
            stream, idx, out, checkpoint=str(tmp_path / ckpt), tau=TAU
        )
        return sorted(
            (r["vec_id"], r["cell"], r["n_eval_hits"], r["first_eval_id"],
             r["contaminated"])
            for r in spark.read.parquet(out).collect()
        )

    streamed = run("ck1")
    assert sorted(
        p for p in os.listdir(out) if p.startswith("gate_batch=")
    ) == ["gate_batch=0", "gate_batch=1"]
    verdicts = {v[0]: v[4] for v in streamed}
    assert verdicts[2999], "planted near-dup must be rejected"
    assert sum(verdicts.values()) == 1, "only the plant is contaminated"
    first_eval = {v[0]: v[3] for v in streamed}
    assert first_eval[2999] == 3 and first_eval[2000] == -1

    # replay from a fresh checkpoint: identical rows, plant still rejected
    assert run("ck2") == streamed

    # index-served == one-shot batch probe == inline operator
    all_c = spark.createDataFrame(cands, "vec_id long, embedding array<double>")
    batch = sorted(
        (r["vec_id"], r["cell"], r["n_eval_hits"], r["first_eval_id"],
         r["contaminated"])
        for r in decontaminate_query_index(spark, idx, all_c, tau=TAU).collect()
    )
    inline = sorted(
        (r["vec_id"], r["cell"], r["n_eval_hits"], r["first_eval_id"],
         r["contaminated"])
        for r in cross_decontaminate(all_c, eval_df, cents, tau=TAU).collect()
    )
    assert streamed == batch == inline


def test_decontam_gate_follows_eval_index_lifecycle(spark, tmp_path):
    """The gate tracks the eval suite's lifecycle: retracting the eval
    item a candidate near-dups flips the verdict to admit (tombstones
    reach the probe before any compaction); extending the index with a
    new eval item flips a matching candidate to reject."""
    import numpy as np

    from spark_nnd_spark.operators.similarity import (
        build_ivf_index,
        decontaminate_query_index,
        extend_ivf_index,
        fixed_centroids,
        retract_from_ivf_index,
    )

    rng = np.random.default_rng(23)
    dim = 16
    cents = fixed_centroids(dim, 8, 23)
    eval_rows = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(20)]
    eval_df = spark.createDataFrame(eval_rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "evalidx")
    build_ivf_index(eval_df, idx, n_centroids=8, centroids=cents)

    plant = [x + 1e-3 for x in eval_rows[5][1]]
    newcomer = [float(x) for x in rng.normal(size=dim)]
    cands = spark.createDataFrame(
        [(3001, plant), (3002, [x + 1e-3 for x in newcomer])],
        "vec_id long, embedding array<double>",
    )
    TAU = 0.95

    def verdicts():
        return {
            r["vec_id"]: r["contaminated"]
            for r in decontaminate_query_index(spark, idx, cands, tau=TAU).collect()
        }

    v = verdicts()
    assert v[3001] and not v[3002]

    # benchmark item 5 dropped from the suite -> its near-dup admits
    retract_from_ivf_index(
        spark, idx, spark.createDataFrame([(5,)], "nb_id long")
    )
    v = verdicts()
    assert not v[3001] and not v[3002]

    # a new benchmark lands -> its near-dup rejects
    extend_ivf_index(
        spark,
        idx,
        spark.createDataFrame(
            [(100, newcomer)], "vec_id long, embedding array<double>"
        ),
    )
    v = verdicts()
    assert not v[3001] and v[3002]


def test_pack_stream_matches_batch_manifest(spark):
    """Single-drain replay: the streaming pack manifest must equal
    q173's batch manifest row-for-row on the same corpus."""
    from spark_nnd_spark.queries.pipeline import q173_pack_manifest
    from spark_nnd_spark.streaming.streams import pack_stream, read_documents_stream

    stream = pack_stream(read_documents_stream(spark, SF_SMOKE))
    run_to_memory_sink(stream, "packs", output_mode="append")
    got = {
        r["doc_id"]: (r["source"], r["block"], r["bin"], r["n_tokens"],
                      r["fill_after"], r["oversize"])
        for r in spark.sql("SELECT * FROM packs").collect()
    }
    want = {
        r["doc_id"]: (r["source"], r["block"], r["bin"], r["n_tokens"],
                      r["fill_after"], r["oversize"])
        for r in q173_pack_manifest(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_pack_stream_state_straddles_batches(spark, tmp_path):
    """3 id-ordered micro-batches with cuts INSIDE packing blocks: a
    pack open at a batch boundary must keep filling from carried state,
    and the merged output must still equal the batch manifest."""
    import os

    from spark_nnd_spark.queries.pipeline import q173_pack_manifest
    from spark_nnd_spark.streaming.streams import pack_stream

    d = tmp_path / "doc_chunks"
    d.mkdir()
    pdf = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text", "source")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = len(pdf)
    cuts = [0, n // 3 + 5, 2 * n // 3 + 7, n]  # off-block-boundary cuts
    for i in range(3):
        p = d / f"chunk{i}.parquet"
        pdf.iloc[cuts[i] : cuts[i + 1]].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    run_to_memory_sink(pack_stream(stream), "packs3", output_mode="append")
    rows = spark.sql("SELECT * FROM packs3").collect()
    got = {
        r["doc_id"]: (r["source"], r["block"], r["bin"], r["n_tokens"],
                      r["fill_after"], r["oversize"])
        for r in rows
    }
    assert len(got) == len(rows), "a doc was packed twice"
    want = {
        r["doc_id"]: (r["source"], r["block"], r["bin"], r["n_tokens"],
                      r["fill_after"], r["oversize"])
        for r in q173_pack_manifest(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_ohlc_stream_matches_batch(spark, events_batch):
    """Streaming OHLC bars == the q207 batch rollup on the same events
    (open/close by event_id, exact cents)."""
    from spark_nnd_spark.streaming import ohlc_stream

    stream = ohlc_stream(read_events_stream(spark, SF_SMOKE))
    run_to_memory_sink(stream, "ohlc", output_mode="complete")
    got = {
        (r["user_id"], r["slot_epoch"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in spark.sql("SELECT * FROM ohlc").collect()
    }
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    want = {
        (r["user_id"], r["slot_epoch"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in events_batch.select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).cast("long").alias("slot_epoch"),
            cents.alias("c"),
            "event_id",
        )
        .groupBy("user_id", "slot_epoch")
        .agg(
            (F.min_by("c", "event_id") / 100.0).alias("open"),
            (F.max("c") / 100.0).alias("high"),
            (F.min("c") / 100.0).alias("low"),
            (F.max_by("c", "event_id") / 100.0).alias("close"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
