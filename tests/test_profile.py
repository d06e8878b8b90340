"""Dataset profiling: null accounting, distinct counts, type lanes."""

from rabitq_spark.operators.profile import profile_table


def test_profile_counts_nulls_and_lanes(spark):
    rows = [
        (1, "a", 1.5),
        (2, None, None),
        (2, "b", 2.5),
        (None, "a", 2.5),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "v"])
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["k"]["n_rows"] == 4
    assert prof["k"]["n_nulls"] == 1
    assert prof["k"]["n_distinct"] == 2
    assert prof["k"]["min_num"] == 1.0 and prof["k"]["max_num"] == 2.0
    assert prof["k"]["min_str"] is None
    assert prof["s"]["n_nulls"] == 1
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None
    assert prof["v"]["n_distinct"] == 2  # 1.5, 2.5 — NULL not counted
    assert prof["v"]["min_num"] == 1.5 and prof["v"]["max_num"] == 2.5


def test_profile_column_subset(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    out = profile_table(df, columns=["b"]).collect()
    assert [r["column"] for r in out] == ["b"]
