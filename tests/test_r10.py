"""Round-10 seventh-wave operators: Nelson-Aalen cumulative hazard,
k-variant chi-squared homogeneity, multi-touch attribution, two-sample
KS statistic, and the Zipf-law corpus-health fit — each pinned against
hand-computed or pure-Python reference math."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F


def test_nelson_aalen_textbook(spark):
    """6 subjects, events at t=1 (1/6) and t=3 (1/4):
    H(1) = 1/6, H(3) = 1/6 + 1/4 = 5/12 ~ 416667 micro."""
    from pd_explain_spark.functions.events import nelson_aalen

    rows = [(1, 1), (2, 0), (3, 1), (3, 0), (4, 0), (5, 0)]
    df = spark.createDataFrame(rows, "dur INT, event INT")
    out = {r["duration"]: r for r in nelson_aalen(df, "dur", "event").collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_at_risk"] == 6 and out[1]["cum_hazard_micro"] == 166667
    assert out[3]["n_at_risk"] == 4 and out[3]["cum_hazard_micro"] == 416667
    with pytest.raises(Exception, match="max_durations"):
        big = spark.createDataFrame([(i, 1) for i in range(30)], "dur INT, event INT")
        nelson_aalen(big, "dur", "event", max_durations=10).collect()


def test_chisq_matches_scipy_free_reference(spark):
    """3 variants with planted counts; chi2 computed by hand the
    textbook way (expected from marginals)."""
    from pd_explain_spark.functions.events import chisq_homogeneity

    counts = {"a": (100, 30), "b": (120, 50), "c": (80, 10)}
    rows = []
    for v, (n, k) in counts.items():
        rows += [(v, 1)] * k + [(v, 0)] * (n - k)
    df = spark.createDataFrame(rows, "variant STRING, success INT")
    out = chisq_homogeneity(df, "variant", "success").collect()[0]
    N = sum(n for n, _ in counts.values())
    K = sum(k for _, k in counts.values())
    chi2 = 0.0
    for n, k in counts.values():
        es, ef = n * K / N, n * (N - K) / N
        chi2 += round((k - es) ** 2 / es * 1e9 + 0.5) // 1 / 1e9
        chi2 += round(((n - k) - ef) ** 2 / ef * 1e9 + 0.5) // 1 / 1e9
    assert out["n_variants"] == 3 and out["dof"] == 2
    assert out["n_total"] == N and out["successes_total"] == K
    assert abs(out["chi2_micro"] - round(chi2 * 1e6)) <= 1
    # two-variant chi2 == z^2 from ab_test_report on the same units
    from pd_explain_spark.functions.events import ab_test_report
    two = df.filter(F.col("variant") != "c")
    z = ab_test_report(two, "variant", "success").collect()[0]["z_micro"] / 1e6
    c2 = chisq_homogeneity(two, "variant", "success").collect()[0]["chi2_micro"] / 1e6
    assert abs(c2 - z * z) < 1e-3


def test_attribution_models(spark):
    from pd_explain_spark.functions.events import attribution_report

    t0 = datetime.datetime(2024, 1, 1)
    m = lambda k: t0 + datetime.timedelta(minutes=k)
    rows = [
        # user 1: view@0, click@10, purchase@20 (val 10)
        (1, 1, "view", m(0), 0.0), (2, 1, "click", m(10), 0.0),
        (3, 1, "purchase", m(20), 10.0),
        # user 2: click@5, purchase@30 (val 4)
        (4, 2, "click", m(5), 0.0), (5, 2, "purchase", m(30), 4.0),
        # user 3: purchase@7 with no touches (val 2) -> (direct)
        (6, 3, "purchase", m(7), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id INT, user_id INT, event_type STRING, ts TIMESTAMP, value DOUBLE"
    )

    def rep(model, **kw):
        out = attribution_report(
            df, "purchase", ["view", "click"], model=model, **kw
        ).collect()
        return {r["channel"]: r for r in out}

    last = rep("last")
    assert last["click"]["credit_micro"] == 2_000_000      # users 1 and 2
    assert last["(direct)"]["credit_micro"] == 1_000_000
    assert last["click"]["attributed_value_micro"] == 14_000_000
    first = rep("first")
    assert first["view"]["credit_micro"] == 1_000_000      # user 1's first touch
    assert first["click"]["credit_micro"] == 1_000_000     # user 2
    lin = rep("linear")
    assert lin["view"]["credit_micro"] == 500_000          # half of user 1
    assert lin["click"]["credit_micro"] == 1_500_000       # half + whole
    assert lin["click"]["attributed_value_micro"] == 9_000_000  # 5 + 4
    # credits always total the conversion count
    for r in (last, first, lin):
        assert sum(v["credit_micro"] for v in r.values()) == 3_000_000
    # conversion window: 15 minutes cuts user 2's click@5 (25 min gap)
    wlast = rep("last", within="15 minutes")
    assert wlast["(direct)"]["credit_micro"] == 2_000_000
    with pytest.raises(ValueError, match="model"):
        attribution_report(df, "purchase", ["view"], model="shapley")


def test_ks_two_sample_matches_python(spark):
    from pd_explain_spark.functions.drift import ks_two_sample

    a = [1, 1, 2, 3, 5, 8, 13, 21]
    b = [2, 3, 4, 4, 6, 9]
    da = spark.createDataFrame([(v,) for v in a], "value INT")
    db = spark.createDataFrame([(v,) for v in b], "value INT")
    out = ks_two_sample(da, db, "value").collect()[0]

    def ecdf(xs, x):
        return sum(1 for v in xs if v <= x) / len(xs)

    d_ref = max(abs(ecdf(a, x) - ecdf(b, x)) for x in sorted(set(a + b)))
    assert out["n_a"] == 8 and out["n_b"] == 6
    assert abs(out["d_micro"] - round(d_ref * 1e6)) <= 1
    # identical distributions -> D == 0
    same = ks_two_sample(da, da, "value").collect()[0]
    assert same["d_micro"] == 0
    with pytest.raises(Exception, match="max_values"):
        ks_two_sample(da, db, "value", max_values=3).collect()


def test_zipf_fit_recovers_planted_slope(spark):
    """Plant counts c(r) = round(1000 * r^-0.8): the fit must recover
    slope ~ -0.8 (nano-rounded term noise only)."""
    from pd_explain_spark.functions.text import zipf_fit

    words = []
    for r in range(1, 41):
        c = max(1, round(1000 * r ** -0.8))
        words += [f"w{r:02d}"] * c
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id INT, text STRING")
    out = zipf_fit(df, max_rank=40).collect()[0]
    assert out["n_ranks"] == 40
    slope = out["slope_micro"] / 1e6
    assert -0.85 < slope < -0.75
    # reference least squares on the same (rank, count) pairs
    pts = [(math.log(r), math.log(max(1, round(1000 * r ** -0.8))))
           for r in range(1, 41)]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    ref = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(slope - ref) < 1e-3
    with pytest.raises(ValueError, match="max_rank"):
        zipf_fit(df, max_rank=1)


def test_windowed_ks_matches_python(spark):
    """Batch windowed KS vs a pure-Python probe-grid ECDF: one hour with
    the reference distribution (D ~ 0) and one shifted hour (D large)."""
    import datetime

    from pd_explain_spark.functions.drift import ks_reference, windowed_ks

    t0 = datetime.datetime(2024, 1, 1)
    ref_vals = [float(v) for v in range(1, 101)]            # uniform 1..100
    h1 = ref_vals[:]                                        # same dist
    h2 = [v + 50.0 for v in ref_vals]                       # shifted
    ref_df = spark.createDataFrame([(v,) for v in ref_vals], "value DOUBLE")
    live = [(t0 + datetime.timedelta(minutes=i % 50), v) for i, v in enumerate(h1)]
    live += [
        (t0 + datetime.timedelta(hours=2, minutes=i % 50), v)
        for i, v in enumerate(h2)
    ]
    live_df = spark.createDataFrame(live, "ts TIMESTAMP, value DOUBLE")
    ref = ks_reference(ref_df, "value", n_probes=4)
    rows = sorted(ref.collect(), key=lambda r: r["probe_idx"])
    # n_probes=4 over 1..100 -> probes at ranks 25/50/75/100
    assert [r["probe_value"] for r in rows] == [25.0, 50.0, 75.0, 100.0]
    assert [r["ref_le"] for r in rows] == [25, 50, 75, 100]
    out = {r["window_start"]: r for r in windowed_ks(live_df, ref).collect()}
    same = out["2024-01-01 00:00:00"]
    shifted = out["2024-01-01 02:00:00"]
    assert same["d_micro"] == 0 and same["n_events"] == 100

    def ecdf(xs, x):
        return sum(1 for v in xs if v <= x) / len(xs)

    d_ref = max(
        round(abs(ecdf(h2, p) - ecdf(ref_vals, p)) * 1e6 + 0.5) // 1
        for p in (25.0, 50.0, 75.0, 100.0)
    )
    assert shifted["d_micro"] == d_ref
    with pytest.raises(ValueError, match="n_probes"):
        ks_reference(ref_df, "value", n_probes=1)


def test_audio_features_real_wav_decode(spark):
    """Real RIFF/WAVE PCM16 decode path: features match pure-Python math
    on planted samples; corrupt payloads yield NULL rows; non-PCM
    payloads raise by default and pass with unsupported='null'."""
    from pd_explain_spark.functions.multimodal import (
        MEDIA_SCHEMA, audio_features, make_wav,
    )

    s0 = [((7 * i + 3) % 1999) - 999 for i in range(500)]
    s1 = [0, 100, -100, 100, 0, -5]
    rows = [
        (0, "audio", make_wav(s0, 8000), None, None),
        (1, "audio", make_wav(s1, 16000), None, None),
        (2, "audio", b"RIFFgarbage-not-wave", None, None),   # corrupt -> NULL
        (3, "image", b"P6\n1 1\n255\n\x00\x00\x00", None, None),  # non-audio
    ]
    media = spark.createDataFrame(
        [(i, k, bytearray(p), m, x) for (i, k, p, m, x) in rows],
        "media_id long, kind string, payload binary, mime string, meta string",
    )
    out = {r["media_id"]: r for r in audio_features(media).collect()}
    import math
    n = len(s0)
    ssq = sum(v * v for v in s0)
    assert out[0]["sample_rate"] == 8000 and out[0]["n_samples"] == n
    assert out[0]["duration_ms"] == n * 1000 // 8000
    assert out[0]["peak"] == max(abs(v) for v in s0)
    assert out[0]["rms_milli"] == math.floor(math.sqrt(ssq / n) * 1000 + 0.5)
    assert out[0]["zero_crossings"] == sum(
        1 for i in range(1, n) if s0[i - 1] * s0[i] < 0
    )
    # s1: crossings at 100->-100, -100->100, 0->... (zeros never cross)
    assert out[1]["zero_crossings"] == 2 and out[1]["peak"] == 100
    assert out[2]["sample_rate"] is None          # corrupt -> NULL features
    assert out[3]["sample_rate"] is None          # non-audio row
    # stereo (non-mono) payload: raise by default, NULL on request
    import struct
    stereo = make_wav([1, 2, 3, 4], 8000)
    stereo = stereo.replace(
        struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16),
        struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16),
    )
    sm = spark.createDataFrame(
        [(9, "audio", bytearray(stereo), None, None)],
        "media_id long, kind string, payload binary, mime string, meta string",
    )
    with pytest.raises(Exception, match="PCM"):
        audio_features(sm).collect()
    ok = audio_features(sm, unsupported="null").collect()
    assert ok[0]["sample_rate"] is None


def test_wav_roundtrip():
    from pd_explain_spark.functions.multimodal import _wav_decode, make_wav

    samples = [0, 32767, -32768, 5, -5]
    rate, got = _wav_decode(make_wav(samples, 44100))
    assert rate == 44100 and got == samples


def test_rater_agreement_matches_textbook_kappa(spark):
    """Classic 2-rater example: 50 rows, raters agree on 20 yes + 15 no;
    marginals 25/25 vs 30/20 -> p_o = 0.7, p_e = 0.5, kappa = 0.4."""
    from pd_explain_spark.functions.profiling import rater_agreement

    rows = (
        [("y", "y")] * 20 + [("n", "n")] * 15
        + [("y", "n")] * 5 + [("n", "y")] * 10
    )
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    out = rater_agreement(df, "a", "b").collect()[0]
    assert out["n"] == 50 and out["n_agree"] == 35
    assert out["agree_micro"] == 700_000
    assert out["expected_micro"] == 500_000
    assert out["kappa_micro"] == 400_000
    # constant shared label: p_e = 1 -> kappa undefined (NULL)
    const = spark.createDataFrame([("x", "x")] * 5, "a STRING, b STRING")
    c = rater_agreement(const, "a", "b").collect()[0]
    assert c["agree_micro"] == 1_000_000 and c["kappa_micro"] is None
    # chance-level raters on skewed labels: raw agreement high, kappa ~ 0
    import random
    rnd = random.Random(7)
    skew = [("ok" if rnd.random() < 0.9 else "bad",
             "ok" if rnd.random() < 0.9 else "bad") for _ in range(400)]
    s = rater_agreement(
        spark.createDataFrame(skew, "a STRING, b STRING"), "a", "b"
    ).collect()[0]
    assert s["agree_micro"] > 750_000 and abs(s["kappa_micro"]) < 150_000


def test_benford_report_matches_python(spark):
    """Multiplicative data (2^k) is Benford-distributed; planted uniform
    1..9 repeats are flat. Both checked against pure-Python math."""
    import math

    from pd_explain_spark.functions.profiling import benford_report

    vals = [float(2 ** k) for k in range(1, 63)]  # |v| < 2^63: the documented domain
    df = spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
    out = {r["digit"]: r for r in benford_report(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    from collections import Counter
    ref = Counter(int(str(int(abs(v)))[0]) for v in vals)
    n = sum(ref.values())
    for d in range(1, 10):
        assert out[d]["n"] == ref.get(d, 0)
        assert out[d]["share_micro"] == math.floor(ref.get(d, 0) / n * 1e6 + 0.5)
        assert out[d]["benford_micro"] == math.floor(
            math.log10(1 + 1 / d) * 1e6 + 0.5
        )
    # powers of 2 track Benford closely: digit 1 share ~30%
    assert abs(out[1]["share_micro"] - 301_030) < 35_000
    # zeros/NULLs drop; an all-zero column reports zero counts
    z = spark.createDataFrame([(0.0,), (None,)], "v DOUBLE")
    zo = benford_report(z, "v").collect()
    assert len(zo) == 9 and all(r["n"] == 0 for r in zo)


def test_classification_report_matches_python(spark):
    from pd_explain_spark.functions.profiling import classification_report

    pairs = (
        [("a", "a")] * 8 + [("a", "b")] * 2      # a: tp 8, fn 2
        + [("b", "b")] * 5 + [("b", "a")] * 3    # b: tp 5, fn 3
        + [("c", "a")] * 1                       # c gold never predicted
        + [("b", "d")] * 1                       # d predicted never gold
    )
    df = spark.createDataFrame(pairs, "gold STRING, pred STRING")
    out = {r["class"]: r for r in classification_report(df, "gold", "pred").collect()}
    a = out["a"]
    assert (a["tp"], a["fp"], a["fn"], a["support"]) == (8, 4, 2, 10)
    assert a["precision_micro"] == round(8 / 12 * 1e6)
    assert a["recall_micro"] == 800_000
    p, r = 8 / 12, 0.8
    import math
    pm, rm = math.floor(p * 1e6 + 0.5), 800_000
    assert a["f1_micro"] == math.floor(2 * pm * rm / (pm + rm) + 0.5)
    assert out["c"]["precision_micro"] is None and out["c"]["recall_micro"] == 0
    assert out["d"]["recall_micro"] is None and out["d"]["precision_micro"] == 0
    assert out["c"]["f1_micro"] is None and out["d"]["f1_micro"] is None


def test_calibration_bins_matches_python(spark):
    import math

    from pd_explain_spark.functions.profiling import calibration_bins

    rows = [(i / 20, 1 if (i / 20) > 0.5 else 0) for i in range(21)]
    df = spark.createDataFrame(rows, "score DOUBLE, y INT")
    out = {r["bin"]: r for r in calibration_bins(df, "score", "y", n_bins=5).collect()}
    # 21 scores 0.0..1.0 step 0.05 -> bins of width 0.2; 1.0 clamps to bin 4
    assert [out[b]["n"] for b in range(5)] == [4, 4, 4, 4, 5]
    got = out[4]
    scores4 = [i / 20 for i in range(21) if min(int((i / 20) * 5), 4) == 4]
    sn = sum(math.floor(s * 1e9 + 0.5) for s in scores4)
    assert got["mean_score_micro"] == math.floor(sn / 1e9 / len(scores4) * 1e6 + 0.5)
    assert got["frac_pos_micro"] == 1_000_000
    import pytest as _p
    bad = spark.createDataFrame([(1.5, 1)], "score DOUBLE, y INT")
    with _p.raises(Exception, match="outside"):
        calibration_bins(bad, "score", "y").collect()


def test_r10_edge_hardening(spark):
    """Empty/degenerate inputs fail loud or degrade to NULL, never an
    opaque ANSI cast error; conversion-in-touches and zero-width
    windows are argument errors."""
    from pd_explain_spark.functions.drift import ks_two_sample
    from pd_explain_spark.functions.events import attribution_report, funnel_user_times
    from pd_explain_spark.functions.profiling import rater_agreement

    empty = spark.createDataFrame([], "value INT")
    nonempty = spark.createDataFrame([(1,)], "value INT")
    with pytest.raises(Exception, match="empty sample side"):
        ks_two_sample(empty, nonempty, "value").collect()
    er = rater_agreement(
        spark.createDataFrame([], "a STRING, b STRING"), "a", "b"
    ).collect()[0]
    assert er["n"] == 0 and er["agree_micro"] is None and er["kappa_micro"] is None
    ev = spark.createDataFrame(
        [(1, 1, "purchase", datetime.datetime(2024, 1, 1), 1.0)],
        "event_id INT, user_id INT, event_type STRING, ts TIMESTAMP, value DOUBLE",
    )
    with pytest.raises(ValueError, match="double counting"):
        attribution_report(ev, "purchase", ["view", "purchase"])
    with pytest.raises(ValueError, match="positive"):
        funnel_user_times(ev, ["view", "click"], within="0 hours")
