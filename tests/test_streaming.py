"""Structured Streaming tests: NDJSON ingest round-trip, watermarked window
aggregation vs batch equivalence, session-window vs batch sessionize, and
the applyInPandasWithState running aggregate — all driven with
availableNow triggers over file sources (the production code path, bounded).
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from es_household_retention_spark_job_spark.operators.sessionize import session_stats
from es_household_retention_spark_job_spark.sources.tpch import load_table
from es_household_retention_spark_job_spark.streaming import ingest, stateful, windows

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events").cache()


@pytest.fixture(scope="module")
def events_ndjson_dir(spark, events, tmp_path_factory):
    """events table re-serialized as NDJSON files (the streaming input)."""
    d = tmp_path_factory.mktemp("stream_in")
    rows = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "value",
    ).collect()
    for shard in range(4):
        with open(d / f"part-{shard}.json", "w") as f:
            for r in rows[shard::4]:
                f.write(json.dumps(r.asDict()) + "\n")
    return str(d)


def _drain(query):
    query.awaitTermination(120)
    assert not query.isActive


def test_ndjson_ingest_roundtrip(spark, events, events_ndjson_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = ingest.stream_events(spark, events_ndjson_dir)
    assert stream.isStreaming
    _drain(ingest.append_parquet(stream, out, ckpt))
    got = spark.read.parquet(out)
    assert got.count() == events.count()
    # typed round-trip: summing a value column matches the source
    a = got.agg(F.sum(F.round(F.col("value") * 100)).cast("long")).first()[0]
    b = events.agg(F.sum(F.round(F.col("value") * 100)).cast("long")).first()[0]
    assert a == b
    # incremental exactly-once: a second availableNow run appends nothing
    _drain(ingest.append_parquet(ingest.stream_events(spark, events_ndjson_dir), out, ckpt))
    assert spark.read.parquet(out).count() == events.count()


def test_tumbling_counts_stream_matches_batch(spark, events, events_ndjson_dir, tmp_path):
    stream = ingest.stream_events(spark, events_ndjson_dir)
    q = (
        windows.tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.table("tumbling_test")
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )
    # append mode only emits windows finalized by the watermark; every
    # emitted row must match batch, and coverage must be non-trivial
    diff = got.exceptAll(batch)
    assert diff.count() == 0
    assert got.count() > 0


def test_session_window_matches_batch_sessionize(spark, events, events_ndjson_dir, tmp_path):
    stream = ingest.stream_events(spark, events_ndjson_dir)
    q = (
        windows.session_counts(stream, gap="30 minutes", watermark="10 days")
        .writeStream.format("memory")
        .queryName("session_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.table("session_test")
    batch = session_stats(
        events, ["user_id"], "ts", gap_seconds=1800, order_tiebreak=["event_id"]
    ).select("user_id", "session_start", "n_events")
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_streaming_doc_curation_dedups_across_batches(spark, tmp_path):
    """Quality gate + exact dedup over a two-batch document stream: a
    duplicate arriving in a LATER batch must be dropped (cross-batch state),
    and the surviving corpus must equal the batch curation of the union."""
    from es_household_retention_spark_job_spark.streaming import doc_stream

    good = "the quick brown fox jumps over the lazy dog and runs far away today"
    batches = [
        [
            {"doc_id": 1, "text": good, "lang": "en", "source": "s0", "n_chars": len(good)},
            {"doc_id": 2, "text": "x", "lang": "en", "source": "s0", "n_chars": 1},  # too short
            {"doc_id": 3, "text": good + " extra tail of words", "lang": "en",
             "source": "s1", "n_chars": 20},
        ],
        [
            # exact dup of doc 1 (different id/punct-case) — must be dropped
            {"doc_id": 4, "text": good.upper() + "!!", "lang": "en", "source": "s2",
             "n_chars": len(good)},
            {"doc_id": 5, "text": "a completely different document with the usual words in it",
             "lang": "en", "source": "s2", "n_chars": 40},
        ],
    ]
    d = tmp_path / "docs_in"
    d.mkdir()
    base = time.time() - 600
    for i, rows in enumerate(batches):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        # The file source orders micro-batches by mtime (ms granularity);
        # force distinct stamps so batch 0 really arrives first.
        os.utime(p, (base + 60 * i, base + 60 * i))

    stream = doc_stream.stream_documents(spark, str(d), max_files_per_trigger=1)
    out, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    _drain(doc_stream.corpus_append(doc_stream.curate(stream), out, ckpt))

    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 2 not in got  # quality-gated
    assert 4 not in got  # cross-batch duplicate
    assert {1, 3, 5} == got

    batch_union = spark.createDataFrame(
        [tuple(r.values()) for rows in batches for r in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # The surviving CONTENT set is deterministic (which representative row
    # wins a within-batch tie is not) — compare stream vs batch on keys.
    stream_keys = {r.content_key for r in spark.read.parquet(out).collect()}
    batch_keys = {r.content_key for r in doc_stream.curate(batch_union).collect()}
    assert batch_keys == stream_keys

    canon = {
        (r.content_key, r.canonical_id, r.n_docs)
        for r in doc_stream.curate_canonical(batch_union).collect()
    }
    assert {c[0] for c in canon} == stream_keys
    # doc 1 and its later duplicate doc 4 collapse onto canonical_id 1
    assert any(c[1] == 1 and c[2] == 2 for c in canon)


def test_streaming_neardup_matches_batch(spark, tmp_path):
    """Incremental near-dup: odd-id documents stream in and are LSH-matched
    against a static band index of the even-id corpus; the streamed verified
    matches must equal the batch run of the same operator on the same
    split. Also pins that ≥1 match exists so the test can't pass vacuously."""
    from es_household_retention_spark_job_spark.streaming import doc_stream

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    fresh = docs.where(F.col("doc_id") % 2 == 1)
    index = doc_stream.corpus_band_index(corpus).cache()

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with open(in_dir / "docs.json", "w") as f:
        for r in fresh.collect():
            f.write(json.dumps(r.asDict()) + "\n")
    stream = doc_stream.stream_documents(spark, str(in_dir))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(
        doc_stream.neardup_against_corpus(stream, index)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    streamed = {
        (r.doc_id, r.dup_of, r.jaccard_bp)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r.doc_id, r.dup_of, r.jaccard_bp)
        for r in doc_stream.neardup_against_corpus(fresh, index).collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_malformed_json_rows_become_nulls_not_failures(spark, tmp_path):
    """S3 contract: explicit-schema from_json yields null fields for
    malformed/mistyped documents — corrupt input degrades, never crashes
    (the reference's read.json would silently infer a different schema)."""
    d = tmp_path / "bad"
    d.mkdir()
    lines = [
        '{"event_id": 1, "user_id": 2, "event_type": "view", "ts": "2026-01-01 00:00:00", "value": 1.5}',
        "{this is not json",
        '{"event_id": "NOT_A_NUMBER", "user_id": 3, "event_type": "click", "ts": "2026-01-02 00:00:00", "value": 2.0}',
        "",
    ]
    (d / "x.json").write_text("\n".join(lines) + "\n")
    got = (
        spark.read.text(str(d))
        .select(F.from_json("value", ingest.EVENT).alias("d"))
        .select("d.*")
        .collect()
    )
    ok = [r for r in got if r.event_id == 1]
    assert len(ok) == 1 and ok[0].event_type == "view"
    assert all(r.event_id in (1, None) for r in got)  # bad rows → nulls


def test_incremental_retention_matches_batch(spark, tmp_path):
    """Stream the fixture encounters in two micro-batches through the
    incremental retention query; the final household-range table must equal
    the batch pipeline's collapsed output for every household that has
    encounters (encounter-less households are the batch phase-2 population).
    """
    from es_household_retention_spark_job_spark.operators import retention as R
    from es_household_retention_spark_job_spark.sinks.upsert import read_keyed_table
    from es_household_retention_spark_job_spark.sources.fixtures import (
        FIXTURE_AS_OF,
        FIXTURE_CLIENT,
        fixture_frames,
    )
    from es_household_retention_spark_job_spark.streaming import retention_stream

    person, encounter = fixture_frames(spark)
    persons_e = R.eligible_persons(person, FIXTURE_CLIENT)

    # two NDJSON shards → two micro-batches under maxFilesPerTrigger=1
    enc_rows = [r.asDict() for r in encounter.collect()]
    d = tmp_path / "enc_stream"
    d.mkdir()
    for shard in range(2):
        with open(d / f"s{shard}.json", "w") as f:
            for r in enc_rows[shard::2]:
                f.write(json.dumps(r) + "\n")

    enc_stream = ingest.stream_encounters(
        spark, str(d), max_files_per_trigger=1
    )
    target = str(tmp_path / "hh_ranges")
    q = retention_stream.incremental_retention(
        spark,
        enc_stream,
        persons_e,
        target_path=target,
        checkpoint_dir=str(tmp_path / "ckpt"),
        client_code=FIXTURE_CLIENT,
        as_of=FIXTURE_AS_OF,
    )
    q.awaitTermination(180)
    assert not q.isActive

    got = (
        read_keyed_table(spark, target)
        .select("household_id", F.explode("ranges").alias("r"))
        .select(
            F.col("household_id").alias("household"),
            "r.start_date",
            "r.end_date",
            "r.start_date_epoch",
            "r.end_date_epoch",
            "r.retained",
        )
    )

    enc_e = R.eligible_encounters(encounter, FIXTURE_CLIENT, FIXTURE_AS_OF)
    admits = R.person_encounter_admits(persons_e, enc_e)
    retained = R.retained_months(admits)
    months = R.month_grid(spark, FIXTURE_AS_OF)
    hh_with_enc = admits.select("household_id").distinct()
    base = R.retention_base(hh_with_enc, retained, months)
    want = R.collapse_retention(base, FIXTURE_AS_OF)

    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_stateful_running_household_aggregate(spark, tmp_path):
    # tiny NDJSON encounter stream split into two files (two micro-batches
    # under maxFilesPerTrigger=1) to exercise cross-batch state
    d = tmp_path / "enc_in"
    d.mkdir()
    batches = [
        [
            {"encounter_id": "E1", "person_id": "P1", "client_code": "C",
             "admit_date": 1000, "household_id": "H1"},
            {"encounter_id": "E2", "person_id": "P2", "client_code": "C",
             "admit_date": 2000, "household_id": "H1"},
            {"encounter_id": "E3", "person_id": "P3", "client_code": "C",
             "admit_date": 1500, "household_id": "H2"},
        ],
        [
            {"encounter_id": "E4", "person_id": "P1", "client_code": "C",
             "admit_date": 5000, "household_id": "H1"},
        ],
    ]
    for i, rows in enumerate(batches):
        with open(d / f"b{i}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    schema = (
        "encounter_id string, person_id string, client_code string, "
        "admit_date long, household_id string"
    )
    stream = ingest.stream_ndjson(spark, str(d), schema, max_files_per_trigger=1)
    q = (
        stateful.running_household_state(stream)
        .writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.table("state_test")
    final = {
        r.household_id: (r.n_encounters, r.last_admit)
        for r in got.groupBy("household_id")
        .agg(
            F.max("n_encounters").alias("n_encounters"),
            F.max("last_admit").alias("last_admit"),
        )
        .collect()
    }
    assert final == {"H1": (3, 5000), "H2": (1, 1500)}


def test_incremental_retention_microbatch_latency(spark, tmp_path):
    """End-to-end micro-batch latency of the stateful retention path: every
    micro-batch's triggerExecution must finish within a GENEROUS bound (30s
    on the 4-thread test session for a fixture-sized batch — typical is
    ~1-3s), so a pathological regression in the stateful recompute (e.g. a
    plan that re-reads the whole state store per batch, or a lost broadcast
    that turns the grid join into a shuffle) surfaces as a latency cliff
    rather than silently shipping. Uses query progress telemetry, the same
    signal a production monitor would alert on."""
    from es_household_retention_spark_job_spark.sources.fixtures import (
        FIXTURE_AS_OF,
        FIXTURE_CLIENT,
        fixture_frames,
    )
    from es_household_retention_spark_job_spark.operators import retention as R
    from es_household_retention_spark_job_spark.streaming import retention_stream

    person, encounter = fixture_frames(spark)
    persons_e = R.eligible_persons(person, FIXTURE_CLIENT)
    enc_rows = [r.asDict() for r in encounter.collect()]
    d = tmp_path / "enc_stream"
    d.mkdir()
    n_shards = 3
    for shard in range(n_shards):
        with open(d / f"s{shard}.json", "w") as f:
            for r in enc_rows[shard::n_shards]:
                f.write(json.dumps(r) + "\n")

    enc_stream = ingest.stream_encounters(spark, str(d), max_files_per_trigger=1)
    q = retention_stream.incremental_retention(
        spark,
        enc_stream,
        persons_e,
        target_path=str(tmp_path / "hh_ranges"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        client_code=FIXTURE_CLIENT,
        as_of=FIXTURE_AS_OF,
    )
    q.awaitTermination(180)
    assert not q.isActive
    progress = q.recentProgress
    # one progress entry per micro-batch (3 shards @ maxFilesPerTrigger=1)
    batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(batches) >= n_shards - 1, f"too few micro-batches: {len(progress)}"
    lat_ms = [p["durationMs"]["triggerExecution"] for p in batches]
    assert all(ms < 30_000 for ms in lat_ms), f"micro-batch latency blew the bound: {lat_ms}"


def test_watermark_drops_late_rows_and_finalizes_windows(spark, tmp_path):
    """Late-data contract, exercised across micro-batches with the
    semantics Spark actually GUARANTEES: a window may keep absorbing late
    rows while its state lives, but once the watermark finalizes it
    (append-mode emission + state eviction), later arrivals for it are
    DROPPED — the window never re-emits and its count never changes.
    Schedule: b0 advances event time to 10:00 (watermark 08:00 from b1 on);
    b1 delivers an in-watermark row AND triggers finalization of the 00:00
    window at count 2; b2 delivers a row for that finalized window (must
    vanish) plus a watermark-advancing row; b3 advances again so every
    window finalizes."""
    batches = [
        [{"event_id": 1, "user_id": 1, "event_type": "view",
          "ts": "2026-01-01 00:10:00", "value": 1.0},
         {"event_id": 2, "user_id": 1, "event_type": "view",
          "ts": "2026-01-01 00:20:00", "value": 1.0},
         {"event_id": 3, "user_id": 1, "event_type": "view",
          "ts": "2026-01-01 10:00:00", "value": 1.0}],
        # processed under watermark 08:00 -> finalizes the 00:00 window
        [{"event_id": 5, "user_id": 1, "event_type": "view",
          "ts": "2026-01-01 09:10:00", "value": 1.0}],
        # event 4 targets the ALREADY-FINALIZED 00:00 window -> dropped
        [{"event_id": 4, "user_id": 1, "event_type": "view",
          "ts": "2026-01-01 00:30:00", "value": 1.0},
         {"event_id": 6, "user_id": 1, "event_type": "view",
          "ts": "2026-01-02 00:00:00", "value": 1.0}],
        [{"event_id": 7, "user_id": 1, "event_type": "view",
          "ts": "2026-01-03 00:00:00", "value": 1.0}],
    ]
    d = tmp_path / "late_in"
    d.mkdir()
    base = time.time() - 600
    for i, rows in enumerate(batches):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (base + 60 * i, base + 60 * i))

    stream = ingest.stream_events(spark, str(d), max_files_per_trigger=1)
    q = (
        windows.tumbling_counts(
            stream.coalesce(1), window_len="1 hour", watermark="2 hours"
        )
        .writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = spark.table("late_test").collect()
    got = {str(r.window_start): r.n_events for r in rows}
    assert len(rows) == len(got)  # no window ever emitted twice
    # 00:00 finalized with events 1+2; the post-finalization event 4 vanished
    assert got.get("2026-01-01 00:00:00") == 2, got
    assert got.get("2026-01-01 09:00:00") == 1, got  # in-watermark row kept
    assert got.get("2026-01-01 10:00:00") == 1, got
    assert got.get("2026-01-02 00:00:00") == 1, got


def test_streaming_index_maintenance_matches_batch(spark, tmp_path):
    """Streaming front door to the searchable corpus: micro-batches of
    documents fold into the persisted BM25 index (foreachBatch →
    append_text_index) and the final index serves EXACTLY what a
    scan-based search over (base ∪ streamed docs) serves. Replays are
    idempotent: re-applying a committed epoch is a no-op (the epoch rides
    the index's atomic manifest commit)."""
    import os
    import time

    from es_household_retention_spark_job_spark.operators import search as SE
    from es_household_retention_spark_job_spark.streaming import doc_stream

    base_docs = spark.createDataFrame(
        [(100, "retention cohort analysis monthly"),
         (101, "household admission window logic")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "stream_index")
    SE.build_text_index(base_docs, idx)

    rows_by_batch = [
        [{"doc_id": 1, "text": "cohort retention curve for households",
          "lang": "en", "source": "s1", "n_chars": 38}],
        [{"doc_id": 2, "text": "monthly admission cohort window",
          "lang": "en", "source": "s1", "n_chars": 31}],
    ]
    d = tmp_path / "idx_docs_in"
    d.mkdir()
    base_ts = time.time() - 600
    for i, rows in enumerate(rows_by_batch):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (base_ts + 60 * i, base_ts + 60 * i))

    stream = doc_stream.stream_documents(spark, str(d), max_files_per_trigger=1)
    delta = stream.select("doc_id", "text")  # the index's column contract
    _drain(
        doc_stream.index_maintenance_sink(
            delta, idx, str(tmp_path / "idx_ckpt")
        )
    )

    merged = base_docs.unionByName(
        spark.createDataFrame(
            [(1, "cohort retention curve for households"),
             (2, "monthly admission cohort window")],
            "doc_id long, text string",
        )
    )
    queries = [("q1", "cohort retention"), ("q2", "admission window")]
    want = {
        (r.query_id, r.doc_id, r.rank, r.score_x1e6)
        for r in SE.bm25_search(merged, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.doc_id, r.rank, r.score_x1e6)
        for r in SE.bm25_search_indexed(spark, idx, queries, k=5).collect()
    }
    assert got == want and got

    # replay idempotence: re-applying the last committed epoch FROM THE
    # SAME STREAM IDENTITY is a no-op
    m = SE._read_index_manifest(idx)
    last_epoch = m["last_epoch"]
    sid = str(tmp_path / "idx_ckpt")  # the maintenance sink's identity
    assert m["epoch_stream"] == sid
    replay = spark.createDataFrame(
        [(2, "monthly admission cohort window")], "doc_id long, text string"
    )
    assert (
        doc_stream.apply_index_batch(replay, last_epoch, idx, stream_id=sid)
        is False
    )
    assert SE._read_index_manifest(idx) == m  # manifest untouched
    # a NEW epoch from the same stream applies
    assert doc_stream.apply_index_batch(
        spark.createDataFrame(
            [(3, "fresh document entirely")], "doc_id long, text string"
        ),
        last_epoch + 1,
        idx,
        stream_id=sid,
    ) is True
    assert SE._read_index_manifest(idx)["last_epoch"] == last_epoch + 1
    # an ANONYMOUS call against an identified-stream manifest must NOT
    # treat the (incomparable) epoch counters as a replay — even epoch 0
    # appends rather than being silently dropped
    assert doc_stream.apply_index_batch(
        spark.createDataFrame(
            [(4, "anonymous caller document")], "doc_id long, text string"
        ),
        0,
        idx,
    ) is True
    m2 = SE._read_index_manifest(idx)
    # the anonymous epoch commits WITHOUT inheriting the old stream label
    # (labeling it would make the identified stream's next batch look
    # like a replay)
    assert m2["last_epoch"] == 0 and "epoch_stream" not in m2


def test_ann_streaming_maintenance(spark, tmp_path):
    """Streaming IVF-index maintenance: embedding micro-batches fold into
    the persisted vector index via the reader-atomic append; after the
    stream drains, the index serves byte-identical results to a
    same-centroid full build over the merged corpus (the append contract,
    now reached through foreachBatch); a replayed epoch from the same
    stream identity is a no-op."""
    from es_household_retention_spark_job_spark.operators import (
        similarity as S,
    )
    from es_household_retention_spark_job_spark.streaming import doc_stream

    embs = load_table(spark, SF_DIR, "embeddings")
    base = embs.where(F.col("vec_id") % 4 != 0).select(
        "vec_id", "embedding"
    )
    delta = embs.where(F.col("vec_id") % 4 == 0).select(
        "vec_id", S.as_double(F.col("embedding")).alias("embedding")
    )
    queries = embs.where(F.col("vec_id") % 50 == 0)

    idx = str(tmp_path / "ann_stream_idx")
    S.build_ann_index(base, idx, n_cells=8, iters=2)
    base_cents = [
        list(r["centroid"])
        for r in sorted(
            spark.read.parquet(f"{idx}/centroids").collect(),
            key=lambda r: r["cell"],
        )
    ]

    # two NDJSON micro-batches of new vectors
    d = tmp_path / "vec_in"
    d.mkdir()
    delta_rows = delta.collect()
    half = len(delta_rows) // 2
    base_ts = time.time() - 600
    for i, chunk in enumerate((delta_rows[:half], delta_rows[half:])):
        p = d / f"v{i}.json"
        with open(p, "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
                    )
                    + "\n"
                )
        os.utime(p, (base_ts + 60 * i, base_ts + 60 * i))

    stream = doc_stream.stream_vectors(spark, str(d), max_files_per_trigger=1)
    _drain(
        doc_stream.ann_index_maintenance_sink(
            stream, idx, str(tmp_path / "vec_ckpt")
        )
    )

    def rows(path):
        return {
            (r.query_id, r.neighbor_id, r.rank, r.cos_bp)
            for r in S.knn_ivf_indexed(spark, path, queries, k=5).collect()
        }

    full = str(tmp_path / "ann_stream_full")
    S.build_ann_index(
        embs.select("vec_id", "embedding"), full, centroids=base_cents
    )
    got = rows(idx)
    assert got == rows(full) and got

    # and the SQ8 sidecar was maintained in the same commits
    sq8 = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_sq8_indexed(spark, idx, queries, k=5).collect()
    }
    sq8_full = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_sq8_indexed(spark, full, queries, k=5).collect()
    }
    assert sq8 == sq8_full and sq8

    # replay idempotence through the ANN epoch guard
    m = S._read_ann_manifest(idx)
    sid = str(tmp_path / "vec_ckpt")
    assert m["epoch_stream"] == sid
    replay = spark.createDataFrame(
        [(delta_rows[0]["vec_id"], list(delta_rows[0]["embedding"]))],
        "vec_id long, embedding array<double>",
    )
    assert (
        doc_stream.apply_ann_index_batch(
            replay, m["last_epoch"], idx, stream_id=sid
        )
        is False
    )
    assert S._read_ann_manifest(idx) == m


def test_keyed_table_sink_stream_to_fold(spark, tmp_path):
    """End-to-end CDC pipeline: NDJSON micro-batches upsert into a keyed
    table (exactly-once epochs riding the commit app-metadata), the change
    feed sees each version, and a downstream incremental aggregate folds
    current — stream -> keyed store -> read_changes -> fold_aggregate."""
    from pyspark.sql import types as T

    from es_household_retention_spark_job_spark.sinks.incremental_agg import (
        fold_aggregate,
        read_aggregate,
    )
    from es_household_retention_spark_job_spark.sinks.upsert import (
        read_keyed_table,
        table_app_meta,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("g", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    batches = [
        [{"k": "a", "g": 0, "v": 10}, {"k": "b", "g": 1, "v": 20}],
        # k=b re-sent with a new value AND a group move (1 -> 0)
        [{"k": "b", "g": 0, "v": 25}, {"k": "c", "g": 1, "v": 30}],
    ]
    d = tmp_path / "keyed_in"
    d.mkdir()
    base_ts = time.time() - 600
    for i, rows in enumerate(batches):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (base_ts + 60 * i, base_ts + 60 * i))

    tbl = str(tmp_path / "keyed_tbl")
    agg = str(tmp_path / "keyed_agg")
    ckpt = str(tmp_path / "keyed_ckpt")
    stream = ingest.stream_ndjson(spark, str(d), schema, max_files_per_trigger=1)
    _drain(ingest.keyed_table_sink(stream, tbl, key="k", checkpoint_dir=ckpt, n_buckets=4))

    got = {r["k"]: (r["g"], r["v"]) for r in read_keyed_table(spark, tbl).collect()}
    assert got == {"a": (0, 10), "b": (0, 25), "c": (1, 30)}
    meta = table_app_meta(tbl)
    assert meta["epoch_stream"] == ckpt and meta["stream_epoch"] >= 1

    # replayed epoch from the SAME stream identity: no-op, version unchanged
    from es_household_retention_spark_job_spark.sinks.upsert import current_version

    v = current_version(tbl)
    replay = spark.createDataFrame([("b", 9, 999)], schema)
    assert (
        ingest.apply_keyed_batch(
            replay, meta["stream_epoch"], tbl, "k", n_buckets=4, stream_id=ckpt
        )
        is False
    )
    assert current_version(tbl) == v
    # an ANONYMOUS caller never inherits an identified stream's counter
    # (incomparable epochs) — it applies as a normal upsert
    assert (
        ingest.apply_keyed_batch(
            spark.createDataFrame([("d", 2, 40)], schema),
            0,
            tbl,
            "k",
            n_buckets=4,
        )
        is True
    )

    # downstream: the maintained aggregate folds the whole version history
    fold_aggregate(spark, tbl, agg, "g", ("v",), n_buckets=2)
    want = {
        r["g"]: (r["cnt"], r["sum_v"])
        for r in read_keyed_table(spark, tbl)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
        .collect()
    }
    got_agg = {
        r["g"]: (r["cnt"], r["sum_v"]) for r in read_aggregate(spark, agg).collect()
    }
    assert got_agg == want


def test_keyed_table_sink_auto_compact(spark, tmp_path, monkeypatch):
    """auto_compact folds maintenance into the streaming loop: under MoR
    writes every applied batch dirties its buckets, the manifest-only
    policy fires, and the table is clean (no reconciliation tax) when the
    stream drains."""
    from pyspark.sql import types as T

    from es_household_retention_spark_job_spark.sinks.upsert import (
        _read_manifest,
        needs_compaction,
        read_keyed_table,
    )

    monkeypatch.setenv("SPARK_GRAFT_SINK_WRITE_MODE", "mor")
    monkeypatch.setenv("SPARK_GRAFT_SINK_GC_GRACE", "0")
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    batches = [
        [{"k": f"k{i}", "v": i} for i in range(8)],
        [{"k": f"k{i}", "v": i + 100} for i in range(4)],
        [{"k": "k9", "v": 9}],
    ]
    d = tmp_path / "ac_in"
    d.mkdir()
    base_ts = time.time() - 600
    for i, rows in enumerate(batches):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (base_ts + 60 * i, base_ts + 60 * i))
    tbl = str(tmp_path / "ac_tbl")
    stream = ingest.stream_ndjson(spark, str(d), schema, max_files_per_trigger=1)
    _drain(
        ingest.keyed_table_sink(
            stream,
            tbl,
            key="k",
            checkpoint_dir=str(tmp_path / "ac_ckpt"),
            n_buckets=2,
            auto_compact=True,
        )
    )
    got = {r["k"]: r["v"] for r in read_keyed_table(spark, tbl).collect()}
    want = {f"k{i}": i + 100 for i in range(4)}
    want.update({f"k{i}": i for i in range(4, 8)})
    want["k9"] = 9
    assert got == want
    # every applied batch's deltas were folded: no dirty buckets remain
    assert not _read_manifest(tbl).get("mor")
    assert needs_compaction(tbl) is False


def test_persisted_neardup_index_build_append_probe(spark, tmp_path):
    """Maintenance parity for the third retrieval structure: the band
    index persists (band-bucket-partitioned parquet), streaming
    micro-batches APPEND O(delta) band rows through the file sink's own
    transaction log, and probes against the persisted index equal (a) the
    in-memory corpus_band_index path and (b) a from-scratch rebuild over
    the grown corpus."""
    from es_household_retention_spark_job_spark.operators.dedup import (
        build_neardup_index,
        neardup_probe,
        read_neardup_index,
    )
    from es_household_retention_spark_job_spark.streaming import doc_stream

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    fresh = docs.where(F.col("doc_id") % 2 == 1)
    idx_path = str(tmp_path / "nd_idx")
    build_neardup_index(corpus, idx_path)

    # probe equivalence with the in-memory path (same math, same matches)
    want = {
        (r.doc_id, r.dup_of, r.jaccard_bp)
        for r in doc_stream.neardup_against_corpus(
            fresh, doc_stream.corpus_band_index(corpus)
        ).collect()
    }
    got = {
        (r.doc_id, r.dup_of, r.jaccard_bp)
        for r in neardup_probe(
            fresh, read_neardup_index(spark, idx_path)
        ).collect()
    }
    assert got == want and got

    # streaming append: fold the fresh docs in (two micro-batches), then
    # a rebuilt-from-scratch index over the union must serve identical
    # probe results for a third batch of synthetic near-copies
    in_dir = tmp_path / "nd_in"
    in_dir.mkdir()
    rows = [r.asDict() for r in fresh.limit(40).collect()]
    half = len(rows) // 2
    base_ts = time.time() - 600
    for i, chunk in enumerate((rows[:half], rows[half:])):
        p = in_dir / f"b{i}.json"
        with open(p, "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (base_ts + 60 * i, base_ts + 60 * i))
    stream = doc_stream.stream_documents(spark, str(in_dir), max_files_per_trigger=1)
    _drain(
        doc_stream.neardup_index_sink(
            stream, idx_path, str(tmp_path / "nd_ckpt")
        )
    )
    grown = corpus.unionByName(
        spark.createDataFrame([tuple(r.values()) for r in rows], fresh.schema)
    )
    rebuilt = str(tmp_path / "nd_rebuilt")
    build_neardup_index(grown, rebuilt)
    probes = spark.createDataFrame(
        [
            (900000 + r["doc_id"], r["text"] + " appended words tail", r["lang"], r["source"], r["n_chars"])
            for r in rows[:10]
        ],
        fresh.schema,
    )
    from_appended = {
        (r.doc_id, r.dup_of, r.jaccard_bp)
        for r in neardup_probe(probes, read_neardup_index(spark, idx_path)).collect()
    }
    from_rebuilt = {
        (r.doc_id, r.dup_of, r.jaccard_bp)
        for r in neardup_probe(probes, read_neardup_index(spark, rebuilt)).collect()
    }
    assert from_appended == from_rebuilt and from_appended

def test_apply_keyed_batch_race_guards(spark, tmp_path, monkeypatch):
    """ADVICE r9 (ingest.py:116): the FIRST epoch is guarded too. (1) A
    fresh table's bootstrap is claimed via O_EXCL — a live claim by
    another worker aborts with ConcurrentWriteError, a stale claim
    (crashed creator) is broken and the apply proceeds. (2) Right after a
    stream-identity change, a worker that read the PRIOR stream's
    (epoch, stream) pair aborts when a racer commits first — even when
    the old counter numerically equals the new epoch."""
    import es_household_retention_spark_job_spark.sinks.upsert as U
    from es_household_retention_spark_job_spark.sinks.upsert import (
        ConcurrentWriteError,
        table_app_meta,
    )

    schema = "k string, v long"
    tbl = str(tmp_path / "race_tbl")
    df = spark.createDataFrame([("a", 1)], schema)

    # (1a) live bootstrap claim blocks the apply (fail closed, no table)
    claim = f"{tbl}.__init_claim__"
    open(claim, "w").close()
    with pytest.raises(ConcurrentWriteError, match="bootstrapping"):
        ingest.apply_keyed_batch(df, 0, tbl, "k", n_buckets=2, stream_id="s1")
    assert not os.path.exists(tbl)

    # (1b) stale claim is broken; the apply bootstraps and cleans up
    old = time.time() - 1000
    os.utime(claim, (old, old))
    assert (
        ingest.apply_keyed_batch(df, 0, tbl, "k", n_buckets=2, stream_id="s1")
        is True
    )
    assert not os.path.exists(claim)

    # (2) stream identity change s1 -> s2 where s1's recorded counter (0)
    # EQUALS s2's first epoch (0): worker1 commits; worker2, which read
    # the pre-commit metadata, must abort — the pair expectation sees the
    # stream-id flip even though the counter value is unchanged
    stale_meta = dict(table_app_meta(tbl))
    assert stale_meta["stream_epoch"] == 0 and stale_meta["epoch_stream"] == "s1"
    assert (
        ingest.apply_keyed_batch(
            spark.createDataFrame([("b", 2)], schema),
            0,
            tbl,
            "k",
            n_buckets=2,
            stream_id="s2",
        )
        is True
    )
    monkeypatch.setattr(U, "table_app_meta", lambda p: dict(stale_meta))
    with pytest.raises(ConcurrentWriteError):
        ingest.apply_keyed_batch(
            spark.createDataFrame([("c", 3)], schema),
            0,
            tbl,
            "k",
            n_buckets=2,
            stream_id="s2",
        )
    monkeypatch.undo()
    # the aborted racer applied nothing
    from es_household_retention_spark_job_spark.sinks.upsert import (
        read_keyed_table,
    )

    got = {r["k"] for r in read_keyed_table(spark, tbl).collect()}
    assert got == {"a", "b"}


def test_incremental_retention_pipeline_exactly_once(spark, tmp_path):
    """The FLAGSHIP maintenance loop as a stream (round 11): encounter
    micro-batches drive run_incremental — one person-store publish per
    non-empty batch with the (stream, epoch) cursor committed atomically —
    and the final store equals a from-scratch backfill over the full
    encounter set. A restart on the same checkpoint with no new input
    publishes nothing (replay/no-op), and a worker racing a committed
    epoch from stale metadata aborts loudly."""
    import es_household_retention_spark_job_spark.streaming.retention_stream as RS
    from es_household_retention_spark_job_spark.pipeline import run_retention
    from es_household_retention_spark_job_spark.sinks.upsert import (
        current_version,
        read_keyed_table,
        table_app_meta,
        write_keyed_table,
    )
    from es_household_retention_spark_job_spark.sources.fixtures import (
        FIXTURE_AS_OF,
        FIXTURE_CLIENT,
        fixture_frames,
    )

    person, encounter = fixture_frames(spark)
    # start every person unprocessed: the incremental==backfill theorem
    # holds for stores where delta-touched households start unprocessed —
    # the fixture's pre-processed person would be (deliberately) refreshed
    # by the CDC path but kept by the one-shot P8 gate (the documented
    # contrast in pipeline.run_incremental; same normalization as
    # tools/incremental_rehearsal.py)
    htype = person.schema["household_retention_history"].dataType
    person = person.withColumn(
        "household_retention_history", F.lit(None).cast(htype)
    )

    def checksum(path):
        return sorted(
            (r["person_id"], str(r["household_retention_history"]))
            for r in read_keyed_table(spark, path).collect()
        )

    # stream store: person table + an INITIALLY EMPTY encounter store dir;
    # all encounters arrive as two micro-batches
    enc_store = str(tmp_path / "enc_store")
    os.makedirs(enc_store)
    p_stream = str(tmp_path / "p_stream")
    write_keyed_table(person, p_stream, key="person_id", n_buckets=4)

    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    enc_rows = encounter.collect()
    ckpt = str(tmp_path / "ckpt")
    v_hist = []
    for shard in range(2):
        batch = spark.createDataFrame(
            [r for i, r in enumerate(enc_rows) if i % 2 == shard],
            encounter.schema,
        )
        batch.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"b{shard}")
        )
        for f in os.listdir(tmp_path / f"b{shard}"):
            if f.endswith(".parquet"):
                os.rename(
                    tmp_path / f"b{shard}" / f,
                    stream_in / f"shard-{shard}.parquet",
                )
        q = RS.incremental_retention_pipeline(
            spark,
            spark.readStream.schema(encounter.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_in)),
            p_stream,
            enc_store,
            ckpt,
            FIXTURE_CLIENT,
            FIXTURE_AS_OF,
        )
        q.awaitTermination(180)
        assert not q.isActive
        v_hist.append(current_version(p_stream))

    # one publish per batch (each fixture shard touches some household)
    assert v_hist[1] > v_hist[0]
    meta = table_app_meta(p_stream)
    assert meta["retention_stream"] == ckpt and meta["retention_epoch"] >= 1

    # reference: full backfill over the complete encounter set
    enc_all = str(tmp_path / "enc_all")
    encounter.write.mode("overwrite").parquet(enc_all)
    p_ref = str(tmp_path / "p_ref")
    write_keyed_table(person, p_ref, key="person_id", n_buckets=4)
    run_retention(spark, p_ref, enc_all, FIXTURE_CLIENT, FIXTURE_AS_OF)
    assert checksum(p_stream) == checksum(p_ref)

    # replay/no-op: same checkpoint, no new files → no publish
    v_before = current_version(p_stream)
    q = RS.incremental_retention_pipeline(
        spark,
        spark.readStream.schema(encounter.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_in)),
        p_stream,
        enc_store,
        ckpt,
        FIXTURE_CLIENT,
        FIXTURE_AS_OF,
    )
    q.awaitTermination(180)
    assert current_version(p_stream) == v_before
