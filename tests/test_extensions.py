"""As-of join, streaming batch-equivalence, multimodal plumbing, vecs IO,
similarity join, and search metrics."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rabitq_spark.metrics import SearchMetrics
from rabitq_spark.operators.asof import asof_join_backward
from rabitq_spark.operators.events import sessionize, tumbling_window_agg
from rabitq_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    media_table_from_documents,
)
from rabitq_spark.sources.tables import load_table
from rabitq_spark.sources.vecs import decode_vecs_bytes, read_vecs, write_vecs


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (2, 150, 15.0), (3, 50, 5.0)],
        "user_id bigint, ts bigint, lval double",
    )
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 150, "b"), (2, 10, "c"), (9, 1, "z")],
        "user_id bigint, ts bigint, tag string",
    )
    out = asof_join_backward(
        left, right, on="user_id", right_payload=("tag",), tie_col="ts"
    ).collect()
    got = {(r.user_id, r.ts): r.asof_tag for r in out}
    assert got[(1, 100)] == "a"   # inclusive: equal ts matches
    assert got[(1, 200)] == "b"   # latest prior
    assert got[(2, 150)] == "c"
    assert got[(3, 50)] is None   # no right rows for key


def test_asof_tie_breaks_on_unique_id(spark):
    """Two right rows at the same (key, ts): the one with the larger tie_col
    wins, deterministically (ADVICE round 1: tying on the timestamp itself
    made the attached payload nondeterministic)."""
    left = spark.createDataFrame(
        [(1, 10)], "user_id bigint, ts bigint"
    )
    right = spark.createDataFrame(
        [(1, 10, 7, "low"), (1, 10, 9, "high"), (1, 10, 8, "mid")],
        "user_id bigint, ts bigint, rid bigint, tag string",
    )
    out = asof_join_backward(
        left, right, on="user_id", right_payload=("tag",), tie_col="rid"
    ).collect()
    assert out[0].asof_tag == "high"


def test_streaming_equals_batch(spark, sf_dir, tmp_path):
    # stream the events table through Structured Streaming and compare with
    # the batch tumbling aggregate — must match exactly
    from rabitq_spark.streaming import read_events_stream, windowed_counts_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_stream")
    raw.repartition(6).write.parquet(src)

    stream = windowed_counts_stream(read_events_stream(spark, src))
    q = (
        stream.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM win_test")
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    want = (
        tumbling_window_agg(load_table(spark, sf_dir, "events"))
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_multimodal_features_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = media_table_from_documents(docs)
    feats = extract_features(media).toPandas()
    assert len(feats) == 50
    assert all(len(f) == 16 for f in feats["feat"])
    # histogram is L1-normalized
    np.testing.assert_allclose(
        [np.sum(f) for f in feats["feat"]], 1.0, rtol=1e-5
    )
    # payload is the UTF-8 text: media_len == n_chars
    want = {r.doc_id: r.n_chars for r in docs.collect()}
    got = dict(zip(feats["media_id"], feats["media_len"]))
    assert got == want


def test_frame_sample_shapes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    frames = frame_sample(media_table_from_documents(docs), n_frames=4).toPandas()
    assert len(frames) == 40
    assert set(frames["frame_no"]) == {0, 1, 2, 3}
    assert all(len(b) > 0 for b in frames["frame_bytes"])


def test_vecs_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(3)
    vecs = [rng.standard_normal(17).astype(np.float32) for _ in range(9)]
    path = str(tmp_path / "t.fvecs")
    write_vecs(path, vecs, "fvecs")
    # pure decoder
    decoded = decode_vecs_bytes(open(path, "rb").read(), "fvecs")
    assert len(decoded) == 9
    np.testing.assert_array_equal(decoded[4], vecs[4])
    # through Spark
    df = read_vecs(spark, path, "fvecs").toPandas().sort_values("id")
    assert len(df) == 9
    np.testing.assert_allclose(np.vstack(df["vec"].values), np.vstack(vecs))

    ivecs = [np.array([1, 2, 3], np.int32), np.array([7], np.int32)]
    ipath = str(tmp_path / "t.ivecs")
    write_vecs(ipath, ivecs, "ivecs")
    idf = read_vecs(spark, ipath, "ivecs").toPandas().sort_values("id")
    got_ivecs = [list(v) for v in idf["vec"]]
    assert got_ivecs == [[1, 2, 3], [7]]


def test_search_metrics_observed(spark, sf_dir):
    from rabitq_spark.config import RaBitQConfig
    from rabitq_spark.index import build_index, search

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    queries = emb.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    model = build_index(base, RaBitQConfig(n_clusters=8, nprobe=4, topk=5, overfetch=2))
    m = SearchMetrics()
    res = search(model, queries, metrics=m)
    n = res.count()
    assert n > 0
    assert m.rough_count > 0
    assert 0 < m.precise_count <= m.rough_count
    assert 0 < m.ratio <= 1.0


def test_grouped_simjoin_refined_equals_pairs(spark, sf_dir):
    """The BLAS-shortlist default must emit exactly what the all-pairs
    reference plan emits (bit-identical fold distances, same ranking)."""
    from rabitq_spark.operators.simjoin import grouped_similarity_join

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = grouped_similarity_join(
        emb, "label", id_col="vec_id", vec_col="embedding", k=4
    ).collect()
    b = grouped_similarity_join(
        emb, "label", id_col="vec_id", vec_col="embedding", k=4, impl="pairs"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_asof_forward_and_nearest_semantics(spark):
    from rabitq_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
        asof_join_nearest,
    )

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 205), (3, 2, 50)], ["lid", "k", "ts"]
    )
    right = spark.createDataFrame(
        # key 1: right rows at 90, 100, 210; key 2: none
        [(10, 1, 90, 9.0), (11, 1, 100, 1.0), (12, 1, 210, 2.0)],
        ["rid", "k", "ts", "payload"],
    )
    right2 = right.select("rid", "k", "ts", right.ts.alias("rts"), "payload")
    fwd = {
        r["lid"]: (r["asof_rts"], r["asof_payload"])
        for r in asof_join_forward(
            left, right2, on="k", left_ts="ts", right_ts="ts",
            right_payload=("rts", "payload"), tie_col="rid",
        ).collect()
    }
    # lid=1 at 100: inclusive forward match is the row AT 100
    assert fwd[1] == (100, 1.0)
    # lid=2 at 205: next is 210
    assert fwd[2] == (210, 2.0)
    # lid=3 key 2: no right rows
    assert fwd[3] == (None, None)

    near = {
        r["lid"]: (r["asof_rts"], r["asof_payload"])
        for r in asof_join_nearest(
            left, right2, on="k", left_ts="ts", right_ts="ts",
            right_payload=("rts", "payload"), tie_col="rid",
        ).collect()
    }
    assert near[1] == (100, 1.0)   # exact hit
    assert near[2] == (210, 2.0)   # 210 (d=5) beats 100 (d=105)
    assert near[3] == (None, None)

    back = {
        r["lid"]: r["asof_rts"]
        for r in asof_join_backward(
            left, right2, on="k", left_ts="ts", right_ts="ts",
            right_payload=("rts",), tie_col="rid",
        ).collect()
    }
    assert back[2] == 100  # latest at-or-before 205


def test_image_decoders_roundtrip():
    import numpy as np

    from rabitq_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        decode_ppm,
        resize_nearest,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)

    # PPM P6 with a header comment
    ppm = b"P6\n# comment\n7 5\n255\n" + img.tobytes()
    assert (decode_ppm(ppm) == img).all()
    assert (decode_image(ppm) == img).all()

    # 24-bit BMP: bottom-up rows, BGR, 4-byte row padding (7*3=21 -> 24)
    stride = (7 * 3 + 3) & ~3
    rows = []
    for y in range(4, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pixel_data = b"".join(rows)
    header = (
        b"BM"
        + (14 + 40 + len(pixel_data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (7).to_bytes(4, "little", signed=True)
        + (5).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + b"\x00" * 20
    )
    bmp = header + pixel_data
    assert (decode_bmp(bmp) == img).all()
    assert (decode_image(bmp) == img).all()

    # nearest-neighbor resize: exact pixel provenance
    up = resize_nearest(img, 14, 10)
    assert up.shape == (10, 14, 3)
    assert (up[::2][:, ::2] == img).all()


def _tiny_png(img):
    """Minimal valid RGB PNG via stdlib zlib — no codec library needed to
    CONSTRUCT one; decoding it is what needs PIL."""
    import struct
    import zlib

    h, w = img.shape[:2]

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_image_decode_png_with_pil():
    """JPEG/PNG decode behind the optional pillow extra (round-8 verdict
    item 6): real decode when PIL is importable, skip otherwise."""
    import numpy as np
    import pytest

    pytest.importorskip("PIL")
    from rabitq_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    assert (decode_image(_tiny_png(img)) == img).all()


def test_image_decode_png_without_pil_raises():
    """Without PIL the codec boundary must stay LOUD (NotImplementedError
    naming the extra), never a fake decode."""
    import numpy as np
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the raise branch is unreachable")
    except ImportError:
        pass
    from rabitq_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image(_tiny_png(img))


def test_wav_decoder_roundtrip():
    import numpy as np

    from rabitq_spark.operators.multimodal import decode_wav, wav_header_pcm8_mono

    data = bytes(range(100)) * 2
    wav = wav_header_pcm8_mono(len(data), sample_rate=16000) + data
    samples, sr = decode_wav(wav)
    assert sr == 16000
    assert (samples == np.frombuffer(data, dtype=np.uint8)).all()

    # 16-bit stereo with an extra chunk before data (chunk-walk coverage)
    pcm = np.arange(-8, 8, dtype="<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (44100).to_bytes(4, "little") + (44100 * 4).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    body = (
        b"WAVEfmt " + (16).to_bytes(4, "little") + fmt
        + extra
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    wav2 = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + body
    s2, sr2 = decode_wav(wav2)
    assert sr2 == 44100 and s2.shape == (8, 2)
    assert (s2.reshape(-1) == np.arange(-8, 8)).all()


def test_bvecs_roundtrip(spark, tmp_path):
    import numpy as np

    from rabitq_spark.sources.vecs import decode_vecs_bytes, read_vecs, write_vecs

    vecs = [np.array([0, 1, 127, 128, 255], np.uint8), np.array([42], np.uint8)]
    path = str(tmp_path / "t.bvecs")
    write_vecs(path, vecs, "bvecs")
    decoded = decode_vecs_bytes(open(path, "rb").read(), "bvecs")
    np.testing.assert_array_equal(decoded[0], vecs[0])
    df = read_vecs(spark, path, "bvecs").toPandas().sort_values("id")
    got = [list(v) for v in df["vec"]]
    assert got == [[0, 1, 127, 128, 255], [42]]  # 128..255 survive (smallint)


def test_video_container_decoder():
    import numpy as np

    from rabitq_spark.operators.multimodal import decode_video_frames

    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 256, (3, 2, 3), dtype=np.uint8) for _ in range(3)]
    payload = b"".join(b"P6\n2 3\n255\n" + f.tobytes() for f in frames)
    out = decode_video_frames(payload)
    assert len(out) == 3
    for a, b in zip(out, frames):
        assert (a == b).all()
    # mixed frame sizes parse too (each frame has its own header)
    payload2 = (
        b"P6\n2 3\n255\n" + frames[0].tobytes()
        + b"P6\n1 1\n255\n" + bytes([9, 8, 7])
    )
    out2 = decode_video_frames(payload2)
    assert out2[1].shape == (1, 1, 3) and list(out2[1][0, 0]) == [9, 8, 7]


def test_asof_tolerance_bounds_all_directions(spark):
    """merge_asof(tolerance=...) contract: matches beyond the bound null
    out; within the bound they are unchanged — backward, forward, nearest."""
    from rabitq_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
        asof_join_nearest,
    )

    left = spark.createDataFrame(
        [(1, 100), (1, 200)], "id long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 90, 9.0), (1, 250, 25.0)], "id long, ts long, v double"
    )

    def got(df):
        return {
            r["ts"]: r["asof_v"]
            for r in df.select("ts", "asof_v").collect()
        }

    back = got(asof_join_backward(
        left, right, on="id", right_payload=("v",), tolerance=15
    ))
    assert back == {100: 9.0, 200: None}  # 200-90=110 > 15 -> nulled

    fwd = got(asof_join_forward(
        left, right, on="id", right_payload=("v",), tolerance=60
    ))
    assert fwd == {100: None, 200: 25.0}  # 250-100=150 > 60 -> nulled

    near = got(asof_join_nearest(
        left, right, on="id", right_payload=("v",), tolerance=20
    ))
    assert near == {100: 9.0, 200: None}  # nearest to 200 is 250 (50 > 20)


def test_asof_matched_row_null_payload_stays_null(spark):
    """pandas merge_asof keeps the MATCHED row's NULL payload; carrying
    each payload column with an independent last(ignorenulls) would fall
    back to an older row's value instead (round-5 ADVICE). The whole right
    row travels as one struct now — ts and payload are inseparable."""
    from rabitq_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    left = spark.createDataFrame([(1, 200), (1, 90)], "id long, ts long")
    right = spark.createDataFrame(
        [(1, 100, "old"), (1, 150, None)], "id long, ts long, tag string"
    )
    back = {
        r["ts"]: r["asof_tag"]
        for r in asof_join_backward(
            left, right, on="id", right_payload=("tag",)
        ).collect()
    }
    # left ts=200 matches the ts=150 row whose tag is NULL -> stays NULL
    assert back == {200: None, 90: None}

    # tolerance interplay: the match (150) is within tolerance of 200, so
    # the gate passes — and the value must still be the matched row's NULL,
    # never the out-of-tolerance older row's "old"
    back_tol = {
        r["ts"]: r["asof_tag"]
        for r in asof_join_backward(
            left, right, on="id", right_payload=("tag",), tolerance=60
        ).collect()
    }
    assert back_tol == {200: None, 90: None}

    fwd = {
        r["ts"]: r["asof_tag"]
        for r in asof_join_forward(
            spark.createDataFrame([(1, 120)], "id long, ts long"),
            right, on="id", right_payload=("tag",),
        ).collect()
    }
    assert fwd == {120: None}  # next row at 150 has NULL tag -> NULL


def test_asof_plan_is_single_shuffle(spark):
    """The as-of join's selling point is ONE shuffle (union -> hash by key
    -> sort -> window), no range-join explosion — pin the physical plan so
    a regression to a join-based shape is caught."""
    from rabitq_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 100, 1.0)], "k long, ts long, v double")
    right = spark.createDataFrame([(1, 90, "a")], "k long, ts long, tag string")
    out = asof_join_backward(left, right, on="k", right_payload=("tag",))
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
    assert "Join" not in plan  # no join operator anywhere in the plan
