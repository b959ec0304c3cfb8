"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (on by default, session.py) handles moderate
skew by splitting oversized shuffle partitions, but it only helps
sort-merge joins and can't split a single hot KEY's build side. For
power-law keys (one customer with 10% of all orders — the norm in web
event data at 100 TB), explicit salting is the reliable lever:

    fact side:  key -> (key, salt = hash(row) % n_salts)
    dim side:   replicate each row n_salts times, one per salt value
    join on (key, salt), drop salt

The fact side's hot key now spreads over ``n_salts`` reducers; the dim
side grows by a factor of n_salts, which is fine when the dim is small
relative to the fact (the only regime where skew hurts anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on ``key`` with an ``n_salts``-way salt.

    Output columns = fact's ∪ dim's (minus the duplicate key), same as
    a plain ``fact.join(dim, key, how)`` — for fact-preserving joins
    only: each fact row carries exactly one salt, but each dim row is
    replicated n_salts times, so right/full-outer would emit unmatched
    dim rows n_salts times. Those modes raise.

    Deterministic: the salt is xxhash64 of the whole fact row (all
    columns), a pure function of row content — stable across runs,
    task retries, and repartitioning. Fully duplicate rows share a
    salt; that only re-concentrates skew if the hot key's rows are
    byte-identical, in which case they collapse under dedup anyway.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(f"salted_join supports fact-preserving joins only, not how={how!r}")
    salt = (F.xxhash64(*[F.col(c) for c in fact.columns]) % n_salts + n_salts) % n_salts
    fact_s = fact.withColumn("__salt", salt.cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, on=[key, "__salt"], how=how).drop("__salt")
