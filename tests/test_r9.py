"""Round-9 additions: builtin PPM/BMP real decode (no Pillow needed),
classifier-fit sign evidence determinism, and windowed PSI semantics."""

import struct

import pytest

import pd_explain_spark.functions.multimodal as MM


def _ppm(w, h, rgb):
    return b"P6\n# planted\n%d %d\n255\n" % (w, h) + bytes(rgb) * (w * h)


def _bmp(w, h, rows_top_to_bottom):
    """24-bit BI_RGB bottom-up BMP from [(r,g,b) per pixel] rows."""
    stride = (w * 3 + 3) & ~3
    raster = b""
    for row in reversed(rows_top_to_bottom):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        raster += line + b"\0" * (stride - len(line))
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + info + raster


def test_builtin_ppm_bmp_real_decode(spark):
    """The REAL decode branch (fake_decoder=False) runs in this
    Pillow-less environment for the two builtin fixed-layout formats:
    source dims + channel means come from actual pixel bytes."""
    ppm = _ppm(4, 2, (10, 20, 30))
    bmp = _bmp(3, 2, [[(255, 0, 0)] * 3, [(0, 0, 255)] * 3])
    media = spark.createDataFrame(
        [
            (0, "image", ppm, "image/x-portable-pixmap", 4, 2, 0),
            (1, "image", bmp, "image/bmp", 3, 2, 0),
            (2, "audio", b"\x01\x02\x03", "audio/wav", 0, 0, 900),
            (3, "image", None, "image/bmp", 0, 0, 0),
        ],
        schema=MM.MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r
        for r in MM.extract_features(media, fake_decoder=False).collect()
    }
    assert rows[0]["feature"][:6] == [4.0, 2.0, 3.0, 10.0, 20.0, 30.0]
    # half red + half blue rows: means (127.5, 0, 127.5)
    assert rows[1]["feature"][:6] == [3.0, 2.0, 3.0, 127.5, 0.0, 127.5]
    assert rows[2]["feature"] == MM._fake_features(b"\x01\x02\x03")  # audio: byte features
    assert rows[3]["feature"] == [0.0] * 8  # null payload zero-fills

    # real resize: decode -> nearest-neighbor -> P6 re-encode
    rz = {
        r["media_id"]: r
        for r in MM.resize_images(media, 2, 2, fake_decoder=False).collect()
    }
    w, h, get = MM._builtin_decode(bytes(rz[0]["payload"]))
    assert (w, h) == (2, 2) and get(0, 0) == (10, 20, 30)
    w2, h2, get2 = MM._builtin_decode(bytes(rz[1]["payload"]))
    assert (w2, h2) == (2, 2)
    assert get2(0, 0) == (255, 0, 0) and get2(0, 1) == (0, 0, 255)
    assert rz[3]["payload"] is None


def test_builtin_decode_corrupt_and_unsupported(spark):
    """Corrupt builtin payloads honor the corrupt-row contract
    (zero-fill / None, never a crash); non-builtin formats keep the
    documented NotImplementedError stub without Pillow."""
    truncated = _ppm(8, 8, (1, 2, 3))[:30]  # raster cut short
    media = spark.createDataFrame(
        [(0, "image", truncated, "image/x-portable-pixmap", 8, 8, 0)],
        schema=MM.MEDIA_SCHEMA,
    )
    row = MM.extract_features(media, fake_decoder=False).collect()[0]
    assert row["feature"] == [0.0] * 8
    rz = MM.resize_images(media, 4, 4, fake_decoder=False).collect()[0]
    assert rz["payload"] is None
    if not MM.HAS_PIL:
        png_ish = spark.createDataFrame(
            [(1, "image", b"\x89PNG\r\n\x1a\nxx", "image/png", 0, 0, 0)],
            schema=MM.MEDIA_SCHEMA,
        )
        with pytest.raises(Exception) as ei:
            MM.extract_features(png_ish, fake_decoder=False).collect()
        assert "NotImplementedError" in str(ei.value)


def test_quality_fit_evidence_is_deterministic(spark):
    """Two independent L-BFGS fits on the planted separable corpus
    recover identical coefficient signs on every class-exclusive bucket
    — the determinism the quality_fit_evidence oracle hash relies on."""
    import __spark_entry__ as entry

    fn = entry.queries()["quality_fit_evidence"]
    a = sorted(tuple(r) for r in fn(spark, "/root/testdata/sf0.001").collect())
    b = sorted(tuple(r) for r in fn(spark, "/root/testdata/sf0.001").collect())
    assert a == b and len(a) >= 20
    signs = {s for _, s in a}
    assert signs == {1, -1}  # both classes recovered, no zero coefficients


def test_windowed_psi_self_reference_near_zero(spark):
    """A window scored against a reference built from the SAME data
    drifts only by smoothing noise; a disjoint-range window scores
    high. Pins the sign/scale semantics of the PSI monitor."""
    from pd_explain_spark.functions.drift import windowed_psi
    from pd_explain_spark.functions.sketches import value_histogram

    rows = [(f"2024-01-01 0{h}:{m:02d}:00", float(v))
            for h in range(2) for m, v in enumerate(range(60))]
    df = spark.createDataFrame(rows, "ts string, value double").selectExpr(
        "cast(ts as timestamp) ts", "value"
    )
    ref = value_histogram(df, "value", 0.0, 60.0, 12)
    out = {r["window_start"]: r["psi"] for r in windowed_psi(df, ref).collect()}
    assert len(out) == 2 and all(abs(v) < 0.01 for v in out.values())
    shifted = df.selectExpr("ts", "value + 1000 AS value")  # clamps to top bin
    hi = {r["window_start"]: r["psi"] for r in windowed_psi(shifted, ref).collect()}
    assert all(v > 0.25 for v in hi.values())  # "shifted" rule-of-thumb line


def test_dedup_within_doc_semantics(spark):
    """Intra-doc span dedup: repeated chunks drop (first kept, order
    preserved), unique text is untouched, NULL/empty come back 0/0,
    k is validated."""
    from pd_explain_spark.functions.text import dedup_within_doc

    docs = spark.createDataFrame(
        [
            (1, "nav bar home nav bar home real content here nav bar"),
            (2, "all unique words in this one"),
            (3, None),
            (4, "   "),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in dedup_within_doc(docs, k=3).collect()}
    # doc 1 chunks: [nav bar home] x2, [real content here], [nav bar]
    assert (out[1]["n_segments"], out[1]["n_kept"]) == (4, 3)
    assert out[1]["text"] == "nav bar home real content here nav bar"
    assert out[2]["n_kept"] == out[2]["n_segments"] == 2
    assert out[2]["text"] == "all unique words in this one"
    for d in (3, 4):
        assert (out[d]["n_segments"], out[d]["n_kept"], out[d]["text"]) == (0, 0, "")
    with pytest.raises(ValueError, match="k must be"):
        dedup_within_doc(docs, k=0)


def test_canonical_url_collapses_clones(spark):
    """Share-link clones, default ports, case, fragments and param
    order all canonicalize to one key; url_dedup keeps min-id per
    group and drops NULL urls."""
    from pyspark.sql import functions as F

    from pd_explain_spark.functions.text import canonical_url, url_dedup

    rows = [
        (0, "HTTPS://WWW.Shop.COM:443/item/42/?utm_campaign=x&size=L#rev"),
        (1, "https://shop.com/item/42?size=L"),
        (2, "https://shop.com/item/42?size=M"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    canon = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", canonical_url(F.col("url")).alias("c")).collect()}
    assert canon[0] == canon[1] == "https://shop.com/item/42?size=L"
    assert canon[2] == "https://shop.com/item/42?size=M"
    assert canon[3] is None
    kept = {r["doc_id"] for r in url_dedup(df).collect()}
    assert kept == {0, 2}


def test_pair_metrics_planted_and_edges(spark):
    """pair_metrics: hand-computed P/R/F1 on planted sets; reversed and
    repeated pairs canonicalize; empty sides give NULL ratios."""
    from pd_explain_spark.functions.dedup import pair_metrics

    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (5, 6), (5, 6)], "id_a bigint, id_b bigint"
    )  # canonical: {(1,2),(3,4),(5,6)}
    truth = spark.createDataFrame(
        [(2, 1), (3, 4), (7, 8), (9, 10)], "id_a bigint, id_b bigint"
    )  # canonical: 4 pairs, 2 hit
    r = pair_metrics(cand, truth).collect()[0]
    assert (r["n_candidates"], r["n_truth"], r["n_hit"]) == (3, 4, 2)
    assert abs(r["pair_precision"] - round(2 / 3, 6)) < 1e-9
    assert r["pair_recall"] == 0.5
    p, q = 2 / 3, 0.5
    assert abs(r["f1"] - round(2 * p * q / (p + q), 6)) < 1e-9
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    e = pair_metrics(empty, truth).collect()[0]
    assert e["n_candidates"] == 0 and e["pair_precision"] is None
    assert e["pair_recall"] == 0.0 and e["f1"] is None
    z = pair_metrics(cand, empty).collect()[0]
    assert z["pair_recall"] is None and z["pair_precision"] == 0.0


def test_join_profile_exact_explosion_prediction(spark):
    """join_profile's est_join_rows equals the ACTUAL equi-join output,
    including a many-to-many hot key; NULL keys never match and are
    counted per side; a wrong key reads as matched_keys=0."""
    from pd_explain_spark.functions.profiling import join_profile

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "k bigint"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (3,), (None,), (None,)], "k bigint"
    )
    r = join_profile(left, right, on="k").collect()[0]
    assert (r["n_left"], r["null_left"], r["distinct_left"], r["max_fanout_left"]) == (5, 1, 2, 3)
    assert (r["n_right"], r["null_right"], r["distinct_right"], r["max_fanout_right"]) == (5, 2, 2, 2)
    assert r["matched_keys"] == 1
    actual = left.join(right, "k").count()
    assert r["est_join_rows"] == actual == 6  # 3 x 2 on the hot key
    disjoint = join_profile(left, right.selectExpr("k + 100 AS k"), on="k").collect()[0]
    assert disjoint["matched_keys"] == 0 and disjoint["est_join_rows"] == 0


def test_curation_funnel_monotone_and_empty(spark):
    """Funnel rows are one per stage in order; doc counts are monotone
    non-increasing through filtering stages; an empty stage reports
    zeros (not a missing row); no stages raises."""
    from pd_explain_spark.functions.text import curation_funnel

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, None)],
        "doc_id bigint, text string",
    )
    out = curation_funnel(
        [("raw", docs), ("dedup", docs.dropDuplicates(["text"])),
         ("empty", docs.filter("doc_id < 0"))]
    ).collect()
    rows = {r["stage"]: r for r in out}
    assert [r["stage_order"] for r in sorted(out, key=lambda r: r["stage_order"])] == [0, 1, 2]
    assert rows["raw"]["n_docs"] == 3 and rows["raw"]["n_tokens"] == 6
    assert rows["dedup"]["n_docs"] == 2  # NULL text keeps one row
    assert rows["empty"]["n_docs"] == 0 and rows["empty"]["n_tokens"] == 0
    with pytest.raises(ValueError, match="non-empty"):
        curation_funnel([])


def test_compact_dataset_reduces_files_losslessly(spark, tmp_path):
    """compact_dataset: 32 tiny files -> ceil(n/target) files, identical
    rows; shuffle=True balances; target guard raises."""
    import glob as _glob

    from pd_explain_spark.functions.mixing import compact_dataset

    src, out, out2 = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "e")
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    df.repartition(32).write.parquet(src)
    assert len(_glob.glob(src + "/part-*")) == 32
    n_files = compact_dataset(spark, src, out, target_rows_per_file=400)
    assert n_files == 3
    parts = _glob.glob(out + "/part-*")
    assert len(parts) <= 3
    back = spark.read.parquet(out)
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
    compact_dataset(spark, src, out2, target_rows_per_file=400, shuffle=True)
    from pyspark.sql import functions as F

    per_file = (
        spark.read.parquet(out2)
        .withColumn("f", F.input_file_name())
        .groupBy("f").count().collect()
    )
    assert max(r["count"] for r in per_file) - min(r["count"] for r in per_file) <= 34
    with pytest.raises(ValueError, match="target_rows_per_file"):
        compact_dataset(spark, src, str(tmp_path / "z"), target_rows_per_file=0)


def test_curriculum_order_phases_and_determinism(spark):
    """curriculum_order: exact quantile phases (ties at a cut land low),
    NULL scores get NULL phase but keep their rows, reruns are
    byte-identical, and the guard rejects n_phases < 2."""
    from pd_explain_spark.functions.mixing import curriculum_order

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)] + [(99, None)],
        "doc_id bigint, difficulty double",
    )
    out = curriculum_order(df, "difficulty", n_phases=3, n_shards=4)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 10
    # ranks: cut1 = value at ceil(9/3)=3 -> 3.0; cut2 = ceil(18/3)=6 -> 6.0
    assert all(rows[i]["phase"] == 0 for i in (1, 2, 3))
    assert all(rows[i]["phase"] == 1 for i in (4, 5, 6))
    assert all(rows[i]["phase"] == 2 for i in (7, 8, 9))
    assert rows[99]["phase"] is None and rows[99]["shard"] is not None
    again = {r["doc_id"]: r for r in
             curriculum_order(df, "difficulty", n_phases=3, n_shards=4).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {k: tuple(v) for k, v in again.items()}
    with pytest.raises(ValueError, match="n_phases"):
        curriculum_order(df, "difficulty", n_phases=1)


def test_pair_metric_sweep_monotone_and_spine(spark):
    """Sweep: recall is non-increasing in threshold, a threshold above
    every score still reports its zero row, metrics match pair_metrics
    at the same cut, and the guard rejects an empty threshold list."""
    from pd_explain_spark.functions.dedup import pair_metric_sweep, pair_metrics

    cand = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.6), (5, 6, 0.2), (7, 8, 0.05)],
        "id_a bigint, id_b bigint, jaccard double",
    )
    truth = spark.createDataFrame(
        [(1, 2), (5, 6), (9, 10)], "id_a bigint, id_b bigint"
    )
    out = {r["threshold"]: r for r in
           pair_metric_sweep(cand, truth, [0.1, 0.5, 0.99]).collect()}
    assert [out[t]["n_candidates"] for t in (0.1, 0.5, 0.99)] == [3, 2, 0]
    assert [out[t]["n_hit"] for t in (0.1, 0.5, 0.99)] == [2, 1, 0]
    recalls = [out[t]["pair_recall"] for t in (0.1, 0.5, 0.99)]
    assert recalls == sorted(recalls, reverse=True)
    assert out[0.99]["pair_precision"] is None  # zero candidates
    single = pair_metrics(cand.filter("jaccard >= 0.5"), truth).collect()[0]
    assert (out[0.5]["n_candidates"], out[0.5]["n_hit"]) == (
        single["n_candidates"], single["n_hit"]
    )
    assert out[0.5]["f1"] == single["f1"]
    with pytest.raises(ValueError, match="non-empty"):
        pair_metric_sweep(cand, truth, [])


def test_dataset_checksum_order_invariant_and_sensitive(spark):
    """Checksum is invariant to row order / partitioning, changes when
    any value changes, rolls up per-shard, and zero-fills on empty."""
    from pd_explain_spark.functions.profiling import dataset_checksum

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id bigint, v string"
    )
    base = dataset_checksum(df).collect()[0]
    shuffled = dataset_checksum(df.orderBy("v").repartition(7)).collect()[0]
    assert (base["n_rows"], base["checksum"]) == (shuffled["n_rows"], shuffled["checksum"])
    mutated = dataset_checksum(
        df.selectExpr("id", "CASE WHEN id = 2 THEN 'B' ELSE v END AS v")
    ).collect()[0]
    assert mutated["checksum"] != base["checksum"]
    # per-shard roll-up: sums mod M combine additively
    a = dataset_checksum(df.filter("id < 3")).collect()[0]
    b = dataset_checksum(df.filter("id >= 3")).collect()[0]
    assert (a["checksum"] + b["checksum"]) % 2305843009213693951 == base["checksum"]
    empty = dataset_checksum(df.filter("id < 0")).collect()[0]
    assert (empty["n_rows"], empty["checksum"]) == (0, 0)
    with pytest.raises(ValueError, match="no columns"):
        dataset_checksum(df, [])


def test_image_ahash_format_crossing_dups_and_nulls(spark):
    """aHash over the REAL decode path: the same pixels encoded as PPM
    and BMP collide (format-crossing dup), a different gradient does
    not, audio/corrupt rows hash NULL, and hashes beyond 2^53 survive
    the Arrow path exactly (a None in the batch must not coerce the
    column to float64 — regression for the Int64-dtype fix)."""
    from pd_explain_spark.functions.multimodal import (
        _image_ahash_one,
        ahash_pairs,
        image_ahash,
    )

    def pixels(w, h, a, b):
        return [[(a * x + b * y) % 256 for x in range(w)] for y in range(h)]

    def as_ppm(px):
        h, w = len(px), len(px[0])
        body = b"".join(bytes((v, v, v)) for row in px for v in row)
        return b"P6\n%d %d\n255\n" % (w, h) + body

    def as_bmp(px):
        h, w = len(px), len(px[0])
        stride = (w * 3 + 3) & ~3
        raster = b""
        for row in reversed(px):
            line = b"".join(bytes((v, v, v)) for v in row)
            raster += line + b"\0" * (stride - len(line))
        header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                           0, 0, 0, 0)
        return header + info + raster

    g = pixels(16, 16, 7, 1)
    media = spark.createDataFrame(
        [
            (0, "image", as_ppm(g), "image/x-portable-pixmap", 16, 16, None),
            (1, "image", as_bmp(g), "image/bmp", 16, 16, None),
            (2, "image", as_ppm(pixels(16, 16, 11, 3)), "x", 16, 16, None),
            (3, "audio", b"\x00\x01", "audio/wav", None, None, 5),
            (4, "image", b"P6\n4 4\n255\n\x00", "x", 4, 4, None),  # truncated
        ],
        schema=MM.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r["ahash"] for r in image_ahash(media).collect()}
    assert rows[0] == rows[1] and rows[0] is not None
    assert rows[2] is not None and rows[2] != rows[0]
    assert rows[3] is None and rows[4] is None
    # the planted 16x16 gradient's hash needs > 53 bits: exactness pin
    assert rows[0] == _image_ahash_one(as_ppm(g))
    assert abs(rows[0]) > (1 << 53)
    pairs = [(r["id_a"], r["id_b"]) for r in ahash_pairs(image_ahash(media)).collect()]
    assert pairs == [(0, 1)]


def test_image_ahash_survives_block_preserving_rescale(spark):
    """A nearest-neighbor 2x downscale of a block-constant image keeps
    every 8x8 cell mean, so the resized copy collides with the source —
    the resize-dup case aHash exists to catch."""
    from pd_explain_spark.functions.multimodal import (
        _builtin_resize,
        _image_ahash_one,
    )

    # 32x32, constant within each 4x4 tile -> any aligned subsample
    # preserves cell structure
    px = [[((x // 4) * 37 + (y // 4) * 11) % 256 for x in range(32)] for y in range(32)]
    body = b"".join(bytes((v, v, v)) for row in px for v in row)
    src = b"P6\n32 32\n255\n" + body
    small = _builtin_resize(src, 16, 16)
    assert _image_ahash_one(src) == _image_ahash_one(small)


def test_image_ahash_unsupported_format_contract():
    """No-Pillow environment: a non-builtin format raises by default
    (misconfiguration should fail loud) and hashes NULL with
    unsupported='null' (best-effort corpus pass)."""
    import pytest as _p

    from pd_explain_spark.functions.multimodal import HAS_PIL, _image_ahash_one

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    if HAS_PIL:
        _p.skip("Pillow present: the real decode path takes over")
    with _p.raises(NotImplementedError):
        _image_ahash_one(png)
    assert _image_ahash_one(png, unsupported="null") is None
