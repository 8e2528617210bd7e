"""Skew-mitigation operators: salted aggregation and salted join.

At 100 TB a handful of hot keys (the 3 `l_returnflag` values, a
null-heavy join key, one viral document) can pin a single reducer
while 999 executors idle. AQE's skew-join splitting
(session.py enables it) covers sort-merge joins; these operators
cover the two cases AQE does not:

- **salted_aggregate**: two-phase aggregation. Phase 1 groups on
  (keys + salt) so each hot key fans out over ``salt_buckets``
  reducers; phase 2 re-combines the algebraic partials on the true
  keys. The second shuffle moves only |keys| x salt_buckets rows.
  (Spark's partial aggregation already does this per-mapper; salting
  additionally splits the *reduce* side, which matters when one key's
  partials exceed a single reducer's memory/cpu.)
- **salted_join**: replicate the small/dimension side across
  ``salt_buckets`` copies and split the skewed fact side by a
  deterministic per-row salt — a hot key's rows spread over
  ``salt_buckets`` reducers instead of one. Equivalent result set to
  the plain equi-join (verified in tests).

Both produce results identical to their unsalted forms — salting is
purely a physical-distribution choice, which is why the oracle for
the salted-agg query is the plain GROUP BY SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate spec: output_name -> (input_expr_sql, kind)
# kinds are the algebraic aggregates that re-combine losslessly
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts re-combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def _salt_col(df: DataFrame, salt_buckets: int, salt_on: str | None) -> Column:
    """Deterministic per-row salt: hash of a unique column when given
    (reproducible runs), else a uniform random bucket."""
    if salt_on is not None:
        return F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_buckets))
    return (F.rand(seed=0) * salt_buckets).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: {out_name: (input_sql_expr, kind)} with kind in
    {sum, count, min, max}. Example::

        salted_aggregate(li, ["l_returnflag"],
                         {"n": ("1", "count"), "qty": ("l_quantity", "sum")})
    """
    keys = list(keys)
    for kind_name in {k for _, k in aggs.values()}:
        if kind_name not in _COMBINE:
            raise ValueError(f"unsupported aggregate kind {kind_name!r}")

    salted = df.withColumn("_salt", _salt_col(df, salt_buckets, salt_on))
    phase1_aggs = []
    for out, (expr, kind) in aggs.items():
        col = F.expr(expr)
        p = F.count(col) if kind == "count" else getattr(F, kind)(col)
        phase1_aggs.append(p.alias(f"_p_{out}"))
    partials = salted.groupBy(*keys, "_salt").agg(*phase1_aggs)

    phase2_aggs = [
        _COMBINE[kind](F.col(f"_p_{out}")).alias(out)
        for out, (_, kind) in aggs.items()
    ]
    return partials.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    *,
    salt_buckets: int = 16,
    salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the fact side gets a per-row salt, the dim
    side is replicated across every salt value, and the join runs on
    (keys + salt). Result equals ``fact.join(dim, keys, how)``.

    Use when one fact key dominates and the dim side is too large to
    broadcast outright. ``how`` supports inner/left (the replicated
    side must be the non-preserved side)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    keys = list(keys)
    f = fact.withColumn("_salt", _salt_col(fact, salt_buckets, salt_on))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return f.join(d, [*keys, "_salt"], how).drop("_salt")


def join_cardinality_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Exact pre-join output-size profile: (k, n_left, n_right, pairs)
    per join key, where ``pairs = n_left * n_right`` is that key's
    contribution to the join result (|A JOIN B| = sum over keys).

    This is the planner dry-run you execute BEFORE committing a
    100 TB join: it costs two partial-agg shuffles on the join key
    plus a join of the (much smaller) distinct-key tables — never the
    join itself — and tells you the output cardinality exactly, which
    key dominates it, and therefore whether to broadcast, salt
    (:func:`salted_join`), or split a runaway hot key. Catalyst's
    size-in-bytes estimates can be orders of magnitude off after a
    few operators; per-key counts cannot.
    """
    la = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_left")
    )
    ra = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_right")
    )
    return la.join(ra, "k").select(
        "k",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).cast("long").alias("pairs"),
    )
