"""Conversation validation: hand-built chats with known faults."""

from pyspark.sql import functions as F

from rabitq_spark.operators.sft import conversation_stats, sft_filter


def _convs(spark):
    rows = [
        # well-formed: user/assistant/user/assistant
        (0, [("user", "hi"), ("assistant", "hello"), ("user", "how"), ("assistant", "fine")]),
        # starts with assistant
        (1, [("assistant", "hi"), ("user", "yo")]),
        # role repeat in the middle
        (2, [("user", "a"), ("assistant", "b"), ("assistant", "c")]),
        # empty content
        (3, [("user", ""), ("assistant", "x")]),
        # single turn
        (4, [("user", "alone")]),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, conv array<struct<role string, content string>>"
    )


def test_conversation_stats_flags(spark):
    got = {r.doc_id: r for r in conversation_stats(_convs(spark), "conv").collect()}
    assert got[0].valid == 1 and got[0].n_role_repeats == 0
    assert got[0].n_user == 2 and got[0].n_assistant == 2
    assert got[0].total_chars == len("hi") + len("hello") + len("how") + len("fine")
    assert got[1].valid == 0 and got[1].starts_user == 0
    assert got[2].valid == 0 and got[2].n_role_repeats == 1
    assert got[3].valid == 0 and got[3].n_empty == 1
    assert got[4].valid == 0 and got[4].n_turns == 1


def test_sft_filter_keeps_only_valid(spark):
    kept = [r.doc_id for r in sft_filter(_convs(spark), "conv").collect()]
    assert kept == [0]


def test_stats_no_explode_no_shuffle(spark):
    """The validation plan is a single projection over one scan — the
    conversation never explodes into a turns table."""
    import contextlib
    import io

    df = conversation_stats(_convs(spark), "conv")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Generate" not in plan  # no explode
    assert "Exchange" not in plan  # no shuffle
