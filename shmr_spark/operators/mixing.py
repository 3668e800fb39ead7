"""Weighted dataset mixing — the training-mix composer.

A 100 TB training run draws from many corpora at tuned rates ("70%
web, 20% code, 10% books"). The scalable, reproducible way is a
deterministic per-row coin: a multiplicative hash of the row id maps
to [0, 1), and a row survives iff hash < rate. No RNG state, no
sampling shuffle, stable under reruns and appends (a row's fate
depends only on its id), and each source is filtered at the scan —
the union never materializes rejected rows.

The hash is pure int64 arithmetic (Knuth multiplicative), so the
oracle expresses it exactly in SQL.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761
_MOD = 4294967296  # 2^32


def survival_hash(id_col: Column | str, salt: int = 0) -> Column:
    """Deterministic uniform-ish draw in [0, 2^32) from a row id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return ((c.cast("long") + F.lit(salt)) * F.lit(_KNUTH)) % F.lit(_MOD)


def sql_survival_hash(expr: str, salt: int = 0) -> str:
    """DuckDB twin of survival_hash."""
    return f"(((CAST(({expr}) AS BIGINT) + {salt}) * {_KNUTH}) % {_MOD})"


def mix_sources(
    sources: dict[str, tuple[DataFrame, float]],
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Union of each source sampled at its rate.

    sources: name → (df, rate in [0, 1]). Adds a `mix_source` column.
    Rates are per-source sampling fractions (they need not sum to 1 —
    relative corpus sizes already set the mix proportions)."""
    parts = []
    for name, (df, rate) in sources.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"{name}: rate {rate} outside [0, 1]")
        keep = survival_hash(id_col, salt) < int(rate * _MOD)
        parts.append(df.filter(keep).withColumn("mix_source", F.lit(name)))
    return reduce(lambda a, b: a.unionByName(b), parts)


def temperature_mix_rates(
    df: DataFrame,
    group_col: str,
    target_rows: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-group sampling rates for α-temperature rebalancing — the
    multilingual-corpus recipe (sample group g proportional to
    p_g^α): α=1 keeps natural proportions, α→0 approaches uniform,
    upweighting low-resource groups.

    Returns (group_col, n BIGINT, rate DOUBLE) with
    ``rate_g = min(1, target_rows · w_g / (Σw · n_g))``, w_g = n_g^α.
    Group weights are carried as 10⁶-scaled int64 (exact, order-free
    sum) and the rate arithmetic runs on identical operands in any
    engine, so at α=0.5 — where n^α is sqrt(), correctly rounded per
    IEEE-754 in every engine — the derived rates (and therefore the
    hash-gated row selection) are bit-deterministic cross-engine; the
    gate query exploits exactly that. Other α go through pow(),
    deterministic within one engine but not oracle-exact.

    The rates frame is tiny (one row per group) — broadcast it onto
    the corpus and gate rows with survival_hash, e.g.::

        rates = temperature_mix_rates(docs, "lang", target_rows=10**9)
        kept = (docs.join(F.broadcast(rates), "lang")
                    .filter(survival_hash("doc_id") < F.col("rate") * 4294967296.0))
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    w = F.sqrt(F.col("n").cast("double")) if alpha == 0.5 else (
        F.pow(F.col("n").cast("double"), F.lit(float(alpha)))
    )
    weighted = counts.withColumn(
        "__wi", F.floor(w * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    )
    total = weighted.agg(F.sum("__wi").alias("__W"))
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            group_col,
            "n",
            F.least(
                F.lit(1.0),
                (F.lit(float(target_rows)) * F.col("__wi").cast("double"))
                / (F.col("__W").cast("double") * F.col("n").cast("double")),
            ).alias("rate"),
        )
    )
