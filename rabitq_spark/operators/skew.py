"""Skew-aware join: salting for hot keys (100 TB readiness; SURVEY.md §4
risk register — IVF cluster sizes, user activity, and token frequencies are
all power-law skewed).

AQE skew-join splitting (on in session.py) handles most cases at runtime;
explicit salting is the deterministic fallback when one build-side key is so
hot that even split partitions overwhelm a task. The fact side spreads each
row across `salt` sub-keys by a hash of its own row identity; the dim side
replicates each key `salt` times. Both sides then join on (key, salt_id) —
the hot key's rows land in `salt` different tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
    fact_salt_expr: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact ⋈ dim` on `on`, salted `salt` ways.

    `fact_salt_expr` picks the sub-key per fact row (default: a positive
    deterministic hash of the whole row modulo salt). The dim side is
    exploded `salt`× — keep it the small side.
    """
    if fact_salt_expr is None:
        fact_salt_expr = F.pmod(F.xxhash64(*fact.columns), F.lit(salt))
    f = fact.withColumn("__salt", fact_salt_expr.cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return f.join(d, [on, "__salt"], how).drop("__salt")
