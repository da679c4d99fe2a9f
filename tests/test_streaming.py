"""True Structured Streaming paths: readStream file source ->
watermarked windowed agg / session windows / custom stateful operator
-> memory sink with availableNow trigger. Parity asserted against the
batch flavors where semantics coincide."""

import os
import shutil

import pytest

from pd_explain_spark.sources.readers import read_parquet_df
from pd_explain_spark.streaming.windows import (
    stream_running_user_stats,
    stream_session_windows,
    stream_windowed_agg,
    windowed_agg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events as a micro-batch-friendly directory of parquet files with a
    proper timestamp column (the raw table stores TIMESTAMP(NANOS))."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(d, ignore_errors=True)
    read_parquet_df(spark, os.path.join(SF_DIR, "events.parquet")).repartition(4).write.parquet(d)
    return d


def _run_stream(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name != "stats" else "update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_windowed_agg_matches_batch_should_work(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = _run_stream(
        spark, stream_windowed_agg(stream, keys=["event_type"], window="1 hour"), "win"
    )
    batch = windowed_agg(spark.read.parquet(events_dir), keys=["event_type"], window="1 hour")
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stream_session_windows_should_work(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = _run_stream(spark, stream_session_windows(stream, gap="30 minutes"), "sess")
    rows = out.collect()
    assert len(rows) > 0
    assert {"user_id", "session_start", "session_end", "n_events", "sum_value"} == set(out.columns)
    # sessions are per user and non-degenerate
    assert all(r["n_events"] >= 1 for r in rows)


def test_stream_stateful_user_stats_should_work(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = _run_stream(spark, stream_running_user_stats(stream), "stats")
    pdf = out.toPandas()
    assert len(pdf) > 0
    # final state must equal the batch aggregate per user
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg({"value": "sum", "*": "count"})
        .toPandas()
    )
    batch.columns = ["user_id", "n_batch", "s_batch"]
    merged = pdf.merge(batch, on="user_id")
    # stateful op may emit one row per micro-batch in update mode; keep last
    merged = merged.sort_values("n_events").groupby("user_id").tail(1)
    assert (merged["n_events"] == merged["n_batch"]).all()
    assert (abs(merged["sum_value"] - merged["s_batch"]) < 1e-6).all()


def test_stream_dedup_exact_should_work(spark, tmp_path):
    """Planted duplicates across micro-batches: exactly one survivor per
    normalized text, matching the batch dedup_exact identity."""
    import datetime

    from pd_explain_spark.streaming.windows import stream_dedup_exact

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "alpha beta gamma", t0),
        (2, "alpha  beta gamma", t0.replace(minute=5)),   # dup of 1 (whitespace)
        (3, "delta epsilon", t0.replace(minute=10)),
        (4, "alpha beta gamma", t0.replace(minute=20)),   # dup of 1
        (5, "delta  epsilon", t0.replace(minute=25)),     # dup of 3
    ]
    src = str(tmp_path / "docs")
    df = spark.createDataFrame(rows, ["doc_id", "text", "ts"])
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_dedup_exact(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("dedup_stream").collect()
    texts = sorted(r["text"].split()[0] for r in out)
    assert len(out) == 2 and texts == ["alpha", "delta"]


def test_stream_drift_scores_matches_batch(spark, events_dir):
    """Streaming drift monitor parity: with the reference histogram built
    from the SAME data, every window's streaming TV equals the batch
    drift_scores TV (the batch global distribution IS the reference)."""
    from pd_explain_spark.functions.drift import (
        drift_scores,
        reference_histogram,
        stream_drift_scores,
    )

    batch = spark.read.parquet(events_dir)
    ref = reference_histogram(batch, "value", num_bins=20)
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    out = stream_drift_scores(stream, ref, window="1 hour", watermark="10 hours")
    q = (
        out.writeStream.format("memory").queryName("drift_q")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: (r["n_events"], r["tv"])
        for r in spark.sql("select * from drift_q").collect()
    }
    want = {
        r["window_start"]: (r["n_events"], r["tv"])
        for r in drift_scores(batch, window="1 hour", num_bins=20).collect()
    }
    assert got == want and len(want) > 0


def test_stream_psi_scores_matches_batch(spark, events_dir):
    """Streaming PSI monitor parity (r9): per-window PSI of the replayed
    stream against a trusted reference histogram equals the batch
    windowed_psi on the same reference — the stream's explicit
    all-bins fold must equal the batch present-terms + closed-form
    zero-terms algebra exactly."""
    from pd_explain_spark.functions.drift import stream_psi_scores, windowed_psi
    from pd_explain_spark.functions.sketches import value_histogram

    batch = spark.read.parquet(events_dir)
    ref = value_histogram(
        batch.filter("event_id % 2 = 0"), "value", 0.0, 200.0, 32
    )
    live_b = batch.filter("event_id % 2 = 1")
    stream = spark.readStream.schema(batch.schema).parquet(events_dir).filter(
        "event_id % 2 = 1"
    )
    out = stream_psi_scores(stream, ref, window="1 hour", watermark="10 hours")
    q = (
        out.writeStream.format("memory").queryName("psi_q")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: (r["n_events"], r["psi"])
        for r in spark.sql("select * from psi_q").collect()
    }
    want = {
        r["window_start"]: (r["n_events"], r["psi"])
        for r in windowed_psi(live_b, ref, window="1 hour").collect()
    }
    assert got == want and len(want) > 0
    # the guards fail loud on a grid-less reference / non-positive
    # smoothing
    import pytest as _pytest
    from pyspark.sql import functions as F

    # alias() PRESERVES metadata — strip it explicitly
    bare = ref.select(F.col("bin").alias("bin", metadata={}), "cnt")
    with _pytest.raises(ValueError, match="value_histogram"):
        windowed_psi(live_b, bare)
    with _pytest.raises(ValueError, match="smoothing"):
        windowed_psi(live_b, ref, smoothing=0.0)


def test_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream attribution join (views -> clicks within 10 min per
    user, watermarked both sides) must reproduce the batch interval_join
    row set exactly when the stream is replayed with availableNow."""
    from pd_explain_spark.streaming.windows import interval_join, stream_interval_join

    schema = spark.read.parquet(events_dir).schema
    static = spark.read.parquet(events_dir)
    views_b = static.filter("event_type = 'view'").select("event_id", "user_id", "ts")
    clicks_b = static.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    batch = interval_join(views_b, clicks_b, on="user_id", within="10 minutes").select(
        "event_id", "event_id_r"
    )

    views_s = (
        spark.readStream.schema(schema).parquet(events_dir)
        .filter("event_type = 'view'").select("event_id", "user_id", "ts")
    )
    clicks_s = (
        spark.readStream.schema(schema).parquet(events_dir)
        .filter("event_type = 'click'").select("event_id", "user_id", "ts")
    )
    joined = stream_interval_join(
        views_s, clicks_s, on="user_id", within="10 minutes", watermark="1 hour"
    ).select("event_id", "event_id_r")
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("ivj").collect()}
    want = {tuple(r) for r in batch.collect()}
    assert len(want) > 0
    assert got == want


def test_stream_curation_gates_match_batch(spark, tmp_path):
    """The curation scan stage (quality/token gates + profile columns)
    is stateless, so it must run UNCHANGED on a readStream source and
    agree with batch row for row — this is what makes the gates usable
    in an ingest-time streaming pipeline before any dedup shuffle."""
    import os
    from pd_explain_spark.functions.text import text_profile
    from pd_explain_spark.sources.readers import read_parquet_df

    d = str(tmp_path / "docs_stream")
    read_parquet_df(spark, "/root/testdata/sf0.001/documents.parquet").repartition(
        4
    ).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    gated = lambda df: text_profile(df).filter("quality >= 0.55 AND n_tokens >= 5")
    q = (
        gated(stream)
        .writeStream.format("memory")
        .queryName("curgate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("curgate").collect()}
    want = {tuple(r) for r in gated(spark.read.parquet(d)).collect()}
    assert got == want and len(want) > 0


def test_stream_redact_pii_matches_batch(spark, tmp_path):
    import os
    from pd_explain_spark.functions.mixing import redact_pii
    from pd_explain_spark.sources.readers import read_parquet_df

    d = str(tmp_path / "docs_stream2")
    read_parquet_df(spark, "/root/testdata/sf0.001/documents.parquet").repartition(
        4
    ).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        redact_pii(stream)
        .writeStream.format("memory")
        .queryName("redact")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("redact").count()
    want = redact_pii(spark.read.parquet(d)).count()
    assert got == want and want > 0


def test_stream_corpus_stats_matches_batch(spark, tmp_path):
    """Streaming corpus telemetry parity: the same aggregate expressions
    run per watermarked window on a doc stream and agree with batch
    window-group numbers exactly."""
    import pyspark.sql.functions as F

    from pd_explain_spark.functions.text import _corpus_aggs, stream_corpus_stats

    d = str(tmp_path / "docs_ts")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn(
            "ts",
            F.expr(
                "timestamp '2026-01-01 00:00:00' + "
                "make_interval(0, 0, 0, 0, 0, CAST(doc_id % 180 AS INT), 0)"
            ),
        )
    )
    docs.repartition(4).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    out = stream_corpus_stats(stream, ts_col="ts", by="lang", window="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("cstats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = lambda r: (r["window"]["start"], r["lang"])
    val = lambda r: (r["n_docs"], r["total_tokens"], r["total_chars"], r["avg_tokens"])
    got = {key(r): val(r) for r in spark.table("cstats").collect()}
    batch = spark.read.parquet(d)
    want = {
        key(r): val(r)
        for r in batch.groupBy(F.window("ts", "1 hour"), "lang")
        .agg(*_corpus_aggs("text", 4))
        .collect()
    }
    assert got == want and len(want) >= 3  # 3 hourly windows x langs


def test_stream_near_dup_flags_matches_batch_candidates(spark, tmp_path):
    """Streaming LSH near-dup flags: the flagged doc set must equal the
    id_b side of the BATCH MinHash+LSH candidate pairs (ids assigned in
    arrival order), with state carried ACROSS micro-batches — the
    near-dup of doc 0 arriving in a later file must still collide."""
    import datetime as dt

    from pd_explain_spark.functions.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from pd_explain_spark.streaming.windows import (
        near_dup_flag_summary,
        stream_near_dup_flags,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "home tonight before dawn breaks over the quiet sleeping town"
    )
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows1 = [
        (0, base, t0),
        (1, base.replace("tonight", "today"), t0 + dt.timedelta(minutes=1)),
        (2, "completely different text about spark structured streaming state stores and checkpoints working hard", t0 + dt.timedelta(minutes=2)),
    ]
    rows2 = [(3, base.replace("runs", "walks"), t0 + dt.timedelta(minutes=10))]
    schema = "doc_id long, text string, ts timestamp"
    src = str(tmp_path / "neardup_src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    flags = stream_near_dup_flags(stream, watermark="2 hours")
    q = (
        flags.writeStream.format("memory")
        .queryName("neardup_flags")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("neardup_flags")
    summary = {r["doc_id"]: r for r in near_dup_flag_summary(got).collect()}
    assert set(summary) == {0, 1, 2, 3}  # every doc reports

    batch_docs = spark.createDataFrame(rows1 + rows2, schema)
    cands = minhash_lsh_candidates(
        minhash_signatures(batch_docs, num_hashes=16), bands=4, rows_per_band=4
    )
    expect_flagged = {r["id_b"] for r in cands.collect()}
    assert expect_flagged  # the planted near-dups must actually collide
    assert {d for d, r in summary.items() if r["is_near_dup"]} == expect_flagged
    # matched_id points at an earlier arrival
    for d, r in summary.items():
        if r["is_near_dup"]:
            assert r["matched_id"] < d
    assert not summary[2]["is_near_dup"]  # the distinct doc survives


def test_duration_ms_units():
    from pd_explain_spark.streaming.windows import _duration_ms

    assert _duration_ms("2 hours") == 7_200_000
    assert _duration_ms("500 milliseconds") == 500
    assert _duration_ms("1 week") == 604_800_000
    assert _duration_ms("1 hour 30 minutes") == 5_400_000
    import pytest as _pt

    with _pt.raises(ValueError):
        _duration_ms("3 fortnights")


def test_stream_ingest_dedup_matches_batch(spark, tmp_path):
    """stream_ingest_dedup (r7): the surviving doc set equals the batch
    composition (first-arrival within-stream dedup, then dedup_against
    the corpus) when replayed with availableNow across micro-batches —
    a corpus dup arriving in a later file is still removed, and the
    within-stream dup keeps only its first arrival."""
    import datetime as dt

    from pd_explain_spark.streaming.windows import stream_ingest_dedup

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    corpus = spark.createDataFrame(
        [(900, "existing corpus document about shuffle partitions"),
         (901, "another historical document on catalyst optimization")],
        "doc_id long, text string",
    )
    rows1 = [
        (0, "a genuinely new document about watermarks", t0),
        (1, "Existing   corpus document ABOUT shuffle partitions", t0),  # corpus dup (normalized)
        (2, "a second new document about state stores", t0 + dt.timedelta(minutes=1)),
    ]
    rows2 = [
        (3, "A GENUINELY new document about watermarks", t0 + dt.timedelta(minutes=5)),  # stream dup of 0
        (4, "another historical document on catalyst optimization", t0 + dt.timedelta(minutes=6)),  # corpus dup
        (5, "a third new document entirely fresh content", t0 + dt.timedelta(minutes=7)),
    ]
    schema = "doc_id long, text string, ts timestamp"
    src = str(tmp_path / "ingest_src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = stream_ingest_dedup(stream, corpus, watermark="2 hours")
    q = (
        out.writeStream.format("memory").queryName("ingest_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.table("ingest_dedup").collect()}
    assert got == {0, 2, 5}
    # schema passthrough: original columns survive, no helper columns
    assert set(spark.table("ingest_dedup").columns) == {"doc_id", "text", "ts"}


def test_stream_kmeans_assign_matches_batch(spark, tmp_path):
    """stream_kmeans_assign is bit-identical to batch kmeans_assign on
    the same fitted model, replayed across micro-batches; NULL vectors
    pass through with NULL cluster instead of being dropped."""
    from pd_explain_spark import kmeans_assign, kmeans_fit
    from pd_explain_spark.streaming.windows import stream_kmeans_assign

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = kmeans_fit(emb, k=3, n_iter=2)

    src = str(tmp_path / "vec_src")
    half = emb.filter("vec_id % 2 = 0")
    rest = emb.filter("vec_id % 2 = 1")
    half.coalesce(1).write.mode("append").parquet(src)
    rest.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = stream_kmeans_assign(stream, cents)
    q = (
        out.writeStream.format("memory").queryName("km_assign")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in spark.table("km_assign").collect()
    }
    want = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in kmeans_assign(emb, centroids=cents).collect()
    }
    assert got == want

    # NULL vector: row survives with NULL assignment (batch drops it)
    withnull = spark.createDataFrame(
        [(9001, None)], "vec_id long, embedding array<double>"
    )
    r = stream_kmeans_assign(withnull, cents).collect()[0]
    assert r["cluster"] is None and r["dist2"] is None


def test_drift_scores_null_values_have_no_bin(spark):
    """NULL measurements are excluded from the histograms instead of
    minting a (num_bins+1)-th NULL group that the identity
    limit(num_bins) would then truncate nondeterministically."""
    import datetime as dt

    from pd_explain_spark.functions.drift import drift_scores

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for w in range(2):
        for i in range(40):
            rows.append((t0 + dt.timedelta(hours=w, minutes=i), float(i % 10)))
        rows.append((t0 + dt.timedelta(hours=w, minutes=55), None))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out1 = sorted(map(tuple, drift_scores(df, num_bins=10).collect()))
    out2 = sorted(map(tuple, drift_scores(df, num_bins=10).collect()))
    assert out1 == out2  # deterministic with NULLs present
    # NULL rows are not counted as events
    assert all(n == 40 for _, n, _ in out1)
    # identical distributions across windows: zero total variation
    assert all(tv == 0.0 for _, _, tv in out1)


def test_stream_c4_gopher_gates_match_batch(spark, tmp_path):
    """The r8 curation rules are stateless row expressions, so they
    compose with Structured Streaming unchanged: c4_clean and
    gopher_gates applied to a doc stream produce exactly the batch
    rows (the continuous-ingest shape — gate every micro-batch with
    the same published rules)."""
    import pyspark.sql.functions as F

    from pd_explain_spark import c4_clean, gopher_gates

    d = str(tmp_path / "docs_gate")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id",
        F.regexp_replace(
            F.col("text"), r"((\S+\s+){7}\S+)\s+", "$1.\n"
        ).alias("text"),
    )
    docs.repartition(4).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)

    for name, fn in [("c4gate", c4_clean), ("gophergate", gopher_gates)]:
        q = (
            fn(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(map(tuple, spark.table(name).collect()))
        want = sorted(map(tuple, fn(spark.read.parquet(d)).collect()))
        assert got == want and len(want) > 0


def test_stream_cms_sketch_matches_batch(spark, tmp_path):
    """The CMS sketch is a pure keyed aggregation over fixed cells, so
    Structured Streaming maintains it incrementally with BOUNDED state
    (width*depth counters, independent of stream length) — the
    streaming-ingest flavor of heavy-hitter tracking. In complete mode
    the maintained sketch must equal the batch cms_build cell for cell."""
    from pd_explain_spark.functions.sketches import cms_build

    d = str(tmp_path / "docs_cms")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(
        4
    ).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        cms_build(stream, n=2, width=64, depth=2)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["depth"], r["bucket"]): r["count"] for r in spark.table("cms_stream").collect()}
    want = {
        (r["depth"], r["bucket"]): r["count"]
        for r in cms_build(spark.read.parquet(d), n=2, width=64, depth=2).collect()
    }
    assert got == want and len(want) > 0


def test_stream_source_gates_match_batch(spark, tmp_path):
    """Domain gating in continuous ingest: the gate table is fitted once
    on the reference corpus (source_gate_table) and joined onto the doc
    stream — a stateless broadcast join, so streamed survivors equal the
    batch run row for row."""
    from pd_explain_spark import source_gate_table, source_gates

    d = str(tmp_path / "docs_srcgate")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(4).write.parquet(d)
    gate = source_gate_table(docs, min_docs=5, min_mean_quality=0.75)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        source_gates(stream, gate=gate)
        .writeStream.format("memory")
        .queryName("srcgate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("srcgate").collect()}
    want = {tuple(r) for r in source_gates(spark.read.parquet(d), gate=gate).collect()}
    assert got == want and len(want) > 0


def test_stream_hll_sketch_matches_batch(spark, tmp_path):
    """The HLL register table is a pure keyed max-aggregation, so
    Structured Streaming maintains the distinct-count sketch with
    BOUNDED state (2^p registers per group, independent of stream
    length). In complete mode the maintained registers must equal the
    batch sketch cell for cell."""
    from pyspark.sql import functions as F

    from pd_explain_spark import hll_sketch
    from pd_explain_spark.functions.text import normalized_text

    d = str(tmp_path / "docs_hll")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(
        4
    ).write.parquet(d)
    schema = spark.read.parquet(d).schema

    def toks(df):
        return df.select(
            "lang",
            F.explode(
                F.filter(F.split(normalized_text(F.col("text")), " "),
                         lambda x: x != "")
            ).alias("tok"),
        )

    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        hll_sketch(toks(stream), "tok", p=6, by=["lang"])
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["lang"], r["bucket"]): r["rho"]
           for r in spark.table("hll_stream").collect()}
    want = {(r["lang"], r["bucket"]): r["rho"]
            for r in hll_sketch(toks(spark.read.parquet(d)), "tok", p=6,
                                by=["lang"]).collect()}
    assert got == want and len(want) > 0


def test_stream_value_histogram_matches_batch(spark, tmp_path):
    """The fixed-grid histogram is a keyed count aggregation over at
    most n_bins cells, so streaming maintains the distribution sketch
    with bounded state; complete-mode output equals the batch build —
    the streaming substrate quantile monitoring would run on."""
    from pd_explain_spark import value_histogram

    d = str(tmp_path / "docs_hist")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(
        4
    ).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        value_histogram(stream, "n_chars", 0.0, 1000.0, n_bins=32)
        .writeStream.format("memory")
        .queryName("hist_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["bin"]: r["cnt"] for r in spark.table("hist_stream").collect()}
    want = {
        r["bin"]: r["cnt"]
        for r in value_histogram(
            spark.read.parquet(d), "n_chars", 0.0, 1000.0, n_bins=32
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stream_quantile_trim_matches_batch(spark, tmp_path):
    """Fit-once quantile bounds score a stream statelessly: the trim
    with explicit bounds is one scan predicate, so streamed survivors
    equal the batch run row for row."""
    from pd_explain_spark import exact_quantiles, quantile_trim

    d = str(tmp_path / "docs_qtrim")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(4).write.parquet(d)
    fit = {r["q"]: r["value"]
           for r in exact_quantiles(docs, "n_chars", [0.1, 0.9], n_bins=64).collect()}
    bounds = (fit[0.1], fit[0.9])
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        quantile_trim(stream, "n_chars", bounds=bounds)
        .writeStream.format("memory")
        .queryName("qtrim_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.table("qtrim_stream").collect()}
    want = {r["doc_id"]
            for r in quantile_trim(spark.read.parquet(d), "n_chars",
                                   bounds=bounds).collect()}
    assert got == want and len(want) > 0


def test_stream_url_dedup_and_intra_doc_parity(spark, tmp_path):
    """r9 streaming twins: (1) stream_url_dedup keeps exactly one row
    per canonical URL key (clone set equals the batch url_dedup's key
    set) and NULL urls pass; with a historical corpus the known keys
    drop. (2) dedup_within_doc is stateless scan-stage, so the same
    plan over readStream reproduces the batch rows exactly."""
    import pyspark.sql.functions as F

    from pd_explain_spark.functions.text import canonical_url, dedup_within_doc, url_dedup
    from pd_explain_spark.streaming.windows import stream_url_dedup

    rows = [
        (0, "2024-01-01 00:00:00", "HTTPS://WWW.Shop.COM:443/item/1/?utm_s=x&a=1"),
        (1, "2024-01-01 00:01:00", "https://shop.com/item/1?a=1"),
        (2, "2024-01-01 00:02:00", "https://shop.com/item/2"),
        (3, "2024-01-01 00:03:00", None),
        (4, "2024-01-01 00:04:00", None),
        (5, "2024-01-01 00:05:00", "https://old.site/known"),
    ]
    d = str(tmp_path / "urls")
    spark.createDataFrame(rows, "doc_id bigint, ts string, url string").selectExpr(
        "doc_id", "cast(ts as timestamp) ts", "url"
    ).repartition(2).write.parquet(d)
    static = spark.read.parquet(d)
    corpus = spark.createDataFrame(
        [(99, "https://old.site/known/?utm_x=1")], "doc_id bigint, url string"
    )
    stream = spark.readStream.schema(static.schema).parquet(d)
    q = (
        stream_url_dedup(stream, watermark="1 hour", corpus_df=corpus)
        .writeStream.format("memory").queryName("urlq")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from urlq").collect()
    got_keys = sorted(
        r["k"] for r in spark.createDataFrame(got, static.schema)
        .select(canonical_url(F.col("url")).alias("k")).collect() if r["k"]
    )
    want_keys = sorted(
        r["k"] for r in url_dedup(static.filter("url is not null"))
        .join(corpus.select(canonical_url(F.col("url")).alias("__ck")),
              canonical_url(F.col("url")) == F.col("__ck"), "left_anti")
        .select(canonical_url(F.col("url")).alias("k")).collect()
    )
    assert got_keys == want_keys and len(got_keys) == 2  # item/1 collapsed, known dropped
    assert sum(1 for r in got if r["url"] is None) == 2  # NULLs bypass, never mutually dedup

    # stateless intra-doc dedup: stream plan == batch plan, row for row
    docs_dir = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(
        2
    ).write.parquet(docs_dir)
    sdocs = spark.readStream.schema(spark.read.parquet(docs_dir).schema).parquet(docs_dir)
    q2 = (
        dedup_within_doc(sdocs, k=2)
        .writeStream.format("memory").queryName("idq")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    got2 = {tuple(r) for r in spark.sql("select * from idq").collect()}
    want2 = {tuple(r) for r in dedup_within_doc(spark.read.parquet(docs_dir), k=2).collect()}
    assert got2 == want2 and len(want2) > 0


def test_stream_mad_anomalies_match_batch(spark, events_dir):
    """Streaming robust-anomaly scoring (r9 third wave): scoring a
    replayed stream against a FROZEN robust_stats baseline (the
    fit-once / score-many deployment) flags exactly the rows the batch
    flavor flags with the same stats — the scoring plan is a stateless
    stream-static join, so stream and batch run the identical
    arithmetic."""
    from pyspark.sql import functions as F

    from pd_explain_spark.functions.drift import robust_anomalies, robust_stats

    raw = spark.read.parquet(events_dir)
    batch = raw.select("event_id", F.hour("ts").alias("hr"), "value")
    stats = robust_stats(batch, "value", ["hr"])
    want = sorted(
        (r["event_id"], r["z_micro"])
        for r in robust_anomalies(batch, "value", ["hr"], stats=stats).collect()
    )
    stream = (
        spark.readStream.schema(raw.schema)
        .parquet(events_dir)
        .select("event_id", F.hour("ts").alias("hr"), "value")
    )
    out = robust_anomalies(stream, "value", ["hr"], stats=stats)
    q = (
        out.writeStream.format("memory").queryName("mad_q")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["event_id"], r["z_micro"])
        for r in spark.sql("select * from mad_q").collect()
    )
    assert got == want and len(want) > 0


def test_stream_ks_scores_matches_batch(spark, events_dir):
    """Streaming KS monitor parity (r10): per-window probe-grid KS of
    the replayed stream against a trusted ks_reference equals the batch
    windowed_ks on the same reference — the literal-folded D expression
    is shared, so any drift between the two would be a state bug."""
    from pd_explain_spark.functions.drift import (
        ks_reference, stream_ks_scores, windowed_ks,
    )

    batch = spark.read.parquet(events_dir)
    ref = ks_reference(batch.filter("event_id % 2 = 0"), "value", n_probes=8)
    live_b = batch.filter("event_id % 2 = 1")
    stream = spark.readStream.schema(batch.schema).parquet(events_dir).filter(
        "event_id % 2 = 1"
    )
    out = stream_ks_scores(stream, ref, window="1 hour", watermark="10 hours")
    q = (
        out.writeStream.format("memory").queryName("ks_q")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: (r["n_events"], r["d_micro"])
        for r in spark.sql("select * from ks_q").collect()
    }
    want = {
        r["window_start"]: (r["n_events"], r["d_micro"])
        for r in windowed_ks(live_b, ref, window="1 hour").collect()
    }
    assert got == want and len(want) > 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="reference"):
        windowed_ks(live_b, ref.limit(0))


def test_stream_readability_matches_batch(spark, tmp_path):
    """readability_scores is a stateless scan-stage projection, so it
    composes with Structured Streaming unchanged: per-micro-batch
    readability gating (the continuous-ingest quality screen) produces
    exactly the batch rows."""
    from pd_explain_spark import readability_scores

    d = str(tmp_path / "docs_read")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    docs.repartition(4).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        readability_scores(stream)
        .writeStream.format("memory")
        .queryName("readstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM readstream").collect())
    )
    want = sorted(map(tuple, readability_scores(docs).collect()))
    assert got == want and len(want) == docs.count()


def test_stream_mwu_scores_matches_batch(spark, events_dir):
    """Streaming Mann-Whitney monitor parity (r12): per-window
    snapped-spine U/z of the replayed stream against a trusted
    mwu_reference equals the batch windowed_mann_whitney on the same
    reference — the literal-folded fold is shared, so any drift
    between the two would be a state bug."""
    from pyspark.sql import functions as F

    from pd_explain_spark.functions.drift import (
        mwu_reference, stream_mwu_scores, windowed_mann_whitney,
    )

    batch = spark.read.parquet(events_dir)
    ref = mwu_reference(
        batch.filter("event_id % 2 = 0").select(
            (F.floor(F.col("value") / 25) * 25).cast("double").alias("value")
        )
    )
    live_b = batch.filter("event_id % 2 = 1")
    stream = spark.readStream.schema(batch.schema).parquet(events_dir).filter(
        "event_id % 2 = 1"
    )
    out = stream_mwu_scores(stream, ref, window="1 hour", watermark="10 hours")
    q = (
        out.writeStream.format("memory").queryName("mwu_q")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: (r["n_events"], r["u_micro"], r["z_micro"])
        for r in spark.sql("select * from mwu_q").collect()
    }
    want = {
        r["window_start"]: (r["n_events"], r["u_micro"], r["z_micro"])
        for r in windowed_mann_whitney(live_b, ref, window="1 hour").collect()
    }
    assert got == want and len(want) > 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="reference"):
        windowed_mann_whitney(live_b, ref.limit(0))


def test_windowed_mwu_matches_batch_mwu_on_snapped_values(spark):
    """On spine-valued windows the windowed statistic IS the exact
    tie-corrected batch mann_whitney_u; off-spine live values score as
    the step below (and below-spine values as a 0-win tie group),
    matching batch MWU run on the manually snapped sample."""
    import datetime

    from pd_explain_spark.functions.drift import (
        mann_whitney_u, mwu_reference, windowed_mann_whitney,
    )

    a_vals = [1.0, 1.0, 2.0, 3.0, 3.0, 3.0, 5.0, 8.0, 8.0, 10.0]
    A = spark.createDataFrame([(v,) for v in a_vals], "value double")
    ref = mwu_reference(A, "value")
    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    windows = {
        0: [1.0, 3.0, 3.0, 5.0, 10.0, 10.0],   # on-spine, with ties
        1: [2.0, 2.0, 8.0, 8.0, 8.0],          # on-spine
        2: [4.5, 0.5, 99.0],                   # snaps to 3.0 / below / 10.0
    }
    rows = [
        (t0 + datetime.timedelta(hours=h), v)
        for h, vals in windows.items()
        for v in vals
    ]
    live = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {
        r["window_start"][11:13]: (r["n_events"], r["u_micro"], r["z_micro"])
        for r in windowed_mann_whitney(live, ref).collect()
    }
    spine = sorted(v for v, in ((r["value"],) for r in ref.collect()))

    def snap(v):
        below = [s for s in spine if s <= v]
        return max(below) if below else v  # below-spine keeps its own group
    for h, vals in windows.items():
        B = spark.createDataFrame([(snap(v),) for v in vals], "value double")
        want = mann_whitney_u(A, B, "value").first()
        assert got[f"{h:02d}"] == (
            want["n_b"], want["u_micro"], want["z_micro"]
        ), f"hour {h} diverged"


def test_mwu_reference_fail_loud_contracts(spark):
    import pytest as _pytest

    from pd_explain_spark.functions.drift import mwu_reference

    empty = spark.createDataFrame([], "value double")
    with _pytest.raises(ValueError, match="no non-NULL values"):
        mwu_reference(empty)
    wide = spark.range(600).selectExpr("CAST(id AS DOUBLE) AS value")
    with _pytest.raises(ValueError, match="quantize"):
        mwu_reference(wide, max_values=512)
