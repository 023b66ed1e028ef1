"""Skew-aware join: explicit key salting (SURVEY §4.2 skew story).

First line of defense at 100 TB is AQE's skew-join splitting (on by
default, session.py). Salting is the second, for the case AQE can't
fix: a *single* hot key whose matching rows exceed one task's memory
even after splitting (the celebrity-user / boilerplate-document key).

Mechanics: replicate the small side R times (R = salt factor), salt the
big side's key with ``hash(row) % R`` — every hot-key partition shrinks
R-fold, at the cost of an R× blow-up of the (small) build side. Salting
is wasted work for well-distributed keys, so it is an explicit opt-in
operator, not a default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key pressure
    spread over ``salt_factor`` sub-partitions.

    The big side's salt is derived from a uniformly-distributed row
    hash (cheap, deterministic per row content — no RNG, so plans stay
    replayable); the small side is exploded across every salt value.
    Result rows and schema are identical to a plain join (verified in
    tests/test_llm_ops.py::test_salted_join_equals_plain_join).

    Only ``how`` in {'inner', 'left'} is supported: for right/full
    joins an UNMATCHED small-side row survives once per salt replica
    (salt_factor duplicates), so the identity claim would be false.
    Those joins put the preserved side on the small (replicated) side —
    salting is the wrong tool there; flip the join instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "unmatched small-side rows would be duplicated per salt"
        )
    salted_big = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor)),
    )
    salted_small = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<bigint>")),
    )
    return salted_big.join(salted_small, [key, SALT_COL], how).drop(SALT_COL)
