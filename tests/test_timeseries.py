"""Resample/LOCF: gap rows appear, carries cross gaps, spans are per-user."""

from rabitq_spark.operators.timeseries import resample_locf


def test_resample_locf_gaps_and_carry(spark):
    # user 1: buckets 0 and 3 observed -> grid 0..3 with gaps at 1, 2
    rows = [
        (1, 100, 10.0),        # bucket 0
        (1, 3 * 3600 * 10**6 + 5, 7.0),  # bucket 3
        (2, 2 * 3600 * 10**6, 1.0),      # user 2: single bucket 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    out = {
        (r.user_id, r.bucket_idx): r
        for r in resample_locf(df).collect()
    }
    assert len(out) == 5  # user 1: 0..3 (4 rows), user 2: just 2
    assert out[(1, 0)].n_events == 1 and out[(1, 0)].locf_value == 10.0
    assert out[(1, 1)].n_events == 0 and out[(1, 1)].sum_value is None
    assert out[(1, 1)].locf_value == 10.0  # carried across the gap
    assert out[(1, 2)].locf_value == 10.0
    assert out[(1, 3)].n_events == 1 and out[(1, 3)].locf_value == 7.0
    assert out[(2, 2)].n_events == 1 and out[(2, 2)].locf_value == 1.0
