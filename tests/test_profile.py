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


def test_winsorize_clips_to_exact_fences(spark):
    from rabitq_spark.operators.profile import winsorize

    rows = [(i, "a", float(i)) for i in range(1, 101)]  # values 1..100
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = winsorize(df, "value", "event_type", "event_id").collect()
    clipped = {r.event_id: r.value_winsorized for r in out}
    # fences: ceil(0.05*100)=5 -> 5.0, ceil(0.95*100)=95 -> 95.0
    assert clipped[1] == 5.0 and clipped[4] == 5.0 and clipped[5] == 5.0
    assert clipped[50] == 50.0
    assert clipped[95] == 95.0 and clipped[96] == 95.0 and clipped[100] == 95.0
