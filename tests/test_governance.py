"""k-anonymity (functions/profiling.py) and robust MAD anomalies
(functions/drift.py): planted-frame semantics the sf-table driver
entries can't isolate — null quasi classes, exact suppression sets,
MAD=0 skip, and z-score sign/magnitude."""

import math

import pytest

from pd_explain_spark import k_anonymity_report, k_anonymize, robust_anomalies


@pytest.fixture(scope="module")
def people(spark):
    # classes: (US,eng) x3, (US,fin) x2, (DE,eng) x1, (NULL,eng) x2
    rows = [
        (1, "US", "eng"), (2, "US", "eng"), (3, "US", "eng"),
        (4, "US", "fin"), (5, "US", "fin"),
        (6, "DE", "eng"),
        (7, None, "eng"), (8, None, "eng"),
    ]
    return spark.createDataFrame(rows, "id INT, country STRING, job STRING")


def test_k_anonymity_report_classes_and_flags(people):
    got = {
        (r["country"], r["job"]): (r["class_size"], r["at_risk"])
        for r in k_anonymity_report(people, ["country", "job"], k=2).collect()
    }
    assert got == {
        ("US", "eng"): (3, False),
        ("US", "fin"): (2, False),
        ("DE", "eng"): (1, True),
        (None, "eng"): (2, False),  # NULL quasi value is a real class
    }


def test_k_anonymize_suppresses_small_classes_null_safe(people):
    kept = sorted(r["id"] for r in k_anonymize(people, ["country", "job"], k=2).collect())
    # only the DE singleton is suppressed; the NULL-country class of 2
    # survives (null-safe join keeps it)
    assert kept == [1, 2, 3, 4, 5, 7, 8]
    kept3 = sorted(r["id"] for r in k_anonymize(people, ["country", "job"], k=3).collect())
    assert kept3 == [1, 2, 3]


def test_k_anonymity_validates_args(people):
    with pytest.raises(ValueError):
        k_anonymity_report(people, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity_report(people, ["country"], k=0)


def test_robust_anomalies_flags_extreme_and_keeps_threshold_stable(spark):
    # group "a": 9 values near 10, one extreme 1000. median=10, MAD=1
    a_vals = [8.0, 9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 1000.0]
    # group "b": constant -> MAD=0 -> skipped entirely
    rows = [(i, "a", v) for i, v in enumerate(a_vals)]
    rows += [(100 + i, "b", 5.0) for i in range(4)] + [(199, "b", 500.0)]
    df = spark.createDataFrame(rows, "id INT, g STRING, value DOUBLE")
    out = robust_anomalies(df, "value", by=["g"], z_thresh=3.5).collect()
    assert [r["id"] for r in out] == [9]
    r = out[0]
    assert r["med"] == 10.0 and r["mad"] == 1.0
    z = 0.6745 * (1000.0 - 10.0) / 1.0
    assert r["z_micro"] == math.floor(z * 1e6 + 0.5)


def test_robust_anomalies_ignores_nulls_and_validates(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.0), (3, "a", 2.0), (4, "a", 3.0)],
        "id INT, g STRING, value DOUBLE",
    )
    # nulls drop before stats: median=2, MAD=1, no |z|>3.5 -> empty
    assert robust_anomalies(df, "value", by=["g"]).count() == 0
    with pytest.raises(ValueError):
        robust_anomalies(df, "value", by=[])
