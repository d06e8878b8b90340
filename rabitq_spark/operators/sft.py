"""Conversation (SFT/chat) data validation — the schema-and-structure gate
an instruction-tuning pipeline runs over `array<struct<role,content>>`
columns before a corpus becomes training data: turn counts per role,
role-alternation violations, empty turns, a single well-formed verdict.

Everything is higher-order Column functions over the nested array (filter /
zip_with / aggregate) — per-row codegen, no explode, no shuffle: the
conversation never leaves its row, so a 100 TB chat corpus validates in one
scan. (Contrast with exploding to a turns table: n_turns× the rows and a
re-group shuffle for exactly the same answers.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _role(t: Column) -> Column:
    return t["role"]


def conversation_stats(
    df: DataFrame, conv_col: str = "conv", keep_cols: list[str] | None = None
) -> DataFrame:
    """Per-conversation structural stats:

    n_turns / n_user / n_assistant — role census
    starts_user                    — 1 iff turn 1 is a user turn
    n_role_repeats                 — adjacent same-role pairs (alternation
                                     violations; zip_with against the
                                     1-shifted array, null tail dropped)
    n_empty                        — zero-length contents
    total_chars                    — aggregate fold of content lengths
    valid                          — well-formed verdict: starts with user,
                                     alternates, no empty turns, ≥ 2 turns
    """
    c = F.col(conv_col)
    repeats = F.size(
        F.filter(
            F.zip_with(c, F.slice(c, 2, F.size(c)), lambda a, b: _role(a) == _role(b)),
            lambda x: x,
        )
    )
    n_user = F.size(F.filter(c, lambda t: _role(t) == F.lit("user")))
    n_empty = F.size(F.filter(c, lambda t: F.length(t["content"]) == 0))
    starts_user = (F.element_at(c, 1)["role"] == F.lit("user")).cast("int")
    out = df.select(
        *(keep_cols if keep_cols is not None else [col for col in df.columns if col != conv_col]),
        F.size(c).alias("n_turns"),
        n_user.alias("n_user"),
        (F.size(c) - n_user).alias("n_assistant"),
        starts_user.alias("starts_user"),
        repeats.alias("n_role_repeats"),
        n_empty.alias("n_empty"),
        F.aggregate(
            c, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t["content"])
        ).alias("total_chars"),
    )
    return out.withColumn(
        "valid",
        (
            (F.col("starts_user") == 1)
            & (F.col("n_role_repeats") == 0)
            & (F.col("n_empty") == 0)
            & (F.col("n_turns") >= 2)
        ).cast("int"),
    )


def sft_filter(df: DataFrame, conv_col: str = "conv") -> DataFrame:
    """Keep only well-formed conversations (the rows `conversation_stats`
    marks valid) — same codegen predicates inlined as a filter, one scan."""
    c = F.col(conv_col)
    repeats = F.size(
        F.filter(
            F.zip_with(c, F.slice(c, 2, F.size(c)), lambda a, b: _role(a) == _role(b)),
            lambda x: x,
        )
    )
    n_empty = F.size(F.filter(c, lambda t: F.length(t["content"]) == 0))
    return df.filter(
        (F.element_at(c, 1)["role"] == F.lit("user"))
        & (repeats == 0)
        & (n_empty == 0)
        & (F.size(c) >= 2)
    )
