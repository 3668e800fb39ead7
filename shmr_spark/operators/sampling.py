"""Deterministic sampling operators for training-data pipelines.

Random-looking but fully deterministic: membership is a pure function
of the row's key via xxhash64, so splits are reproducible across
runs, machines, and cluster sizes, rows never migrate between splits
when the corpus grows (append-stability), and no state/seed files are
needed — the property a 100 TB train/eval split actually requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_split_col(key: Column | str, buckets: int = 10_000) -> Column:
    """Uniform [0, buckets) bucket from a key column."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c), F.lit(buckets))


def hash_split_col_md5(key: str | Column, buckets: int = 10_000) -> Column:
    """Cross-engine variant of hash_split_col: bucket from the first
    60 bits of md5(key-as-string). Slower than xxhash64 (md5 + hex
    parse per row) but bit-identical in DuckDB
    (``CAST('0x' || substr(md5(k), 1, 15) AS BIGINT) % buckets``),
    which is what lets the train_test_split driver gate hash-compare
    the actual split assignment."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def train_test_split(
    df: DataFrame,
    key: str,
    test_fraction: float = 0.1,
    buckets: int = 10_000,
    split_col: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(train, test) split on a stable key hash. Disjoint, exhaustive,
    deterministic; ~test_fraction of keys land in test. ``split_col``
    swaps in an alternative bucket expression (e.g.
    hash_split_col_md5 for the cross-engine driver gate)."""
    cut = int(round(test_fraction * buckets))
    b = split_col if split_col is not None else hash_split_col(key, buckets)
    return df.filter(b >= cut), df.filter(b < cut)


def stratified_sample_exact(
    df: DataFrame,
    strata: list[str],
    fraction: float,
    order: list[str],
) -> DataFrame:
    """EXACT stratified sample: the first ceil(fraction·|stratum|) rows
    of each stratum under a deterministic order. One shuffle (the
    window); oracle-expressible in SQL, unlike rate-based sampleBy."""
    w = Window.partitionBy(*strata).orderBy(*order)
    counts = Window.partitionBy(*strata)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(counts))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__rn", "__n")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    test_fraction: float = 0.1,
    buckets: int = 10_000,
    split_col: Column | None = None,
) -> DataFrame:
    """Train/test split that can't leak near-duplicates across the
    boundary: every near-dup CLUSTER (connected components over
    ``pairs``) lands wholly on one side, because the split hash is
    taken over the cluster representative (min id), not the document
    id. Documents in no pair split on their own id as usual.

    This is the split a pretraining pipeline actually needs — an
    id-hash split puts two near-identical documents on opposite
    sides and the eval set silently overlaps the training set.

    Adds ``group_id`` (the cluster representative) and ``split``
    ('train'/'test') to ``df``. One extra join vs the plain split —
    components are (node, comp) pairs, tiny next to the corpus.
    """
    from pyspark.sql import functions as F

    from shmr_spark.dedup.clusters import connected_components

    comps = connected_components(pairs, src, dst)
    grouped = (
        df.join(comps, df[id_col] == comps["node"], "left")
        .withColumn("group_id", F.coalesce(F.col("comp"), F.col(id_col)))
        .drop("node", "comp")
    )
    bucket = (
        split_col
        if split_col is not None
        else hash_split_col(F.col("group_id"), buckets)
    )
    side = F.when(bucket < int(test_fraction * buckets), F.lit("test")).otherwise(
        F.lit("train")
    )
    return grouped.withColumn("split", side)


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: Column | str,
    k: int,
    buckets: int = 1_048_576,
) -> DataFrame:
    """Efraimidis–Spirakis (2006) weighted sampling WITHOUT
    replacement: draw an exact-size sample of ``k`` rows with
    inclusion chances proportional to ``weight`` — the standard tool
    for "keep k documents, preferring high quality" where Bernoulli
    acceptance can't hit an exact size and a temperature mix operates
    on groups, not rows.

    A-ES assigns each row the key u^(1/w) (u uniform) and keeps the
    top k. This implementation is fully DETERMINISTIC and
    cross-engine, compared in log space as ln(u)/w in two exact
    steps: u = (md5-bucket(key) + 0.5) / buckets (the repo's
    hash-uniform idiom — bit-identical in DuckDB) is floor-quantized
    ONCE as q = floor(ln(u)·10⁶ + 0.5) over a FIXED population — the
    2²⁰ bucket midpoints, whose minimum floor-boundary distance is an
    exhaustively-measured design constant (1.33e-7, 41× the ulp-drift
    window; pinned in tests/test_edge_cases.py), not a per-corpus
    property — then divided by the RAW weight as one int64→double
    cast + IEEE division, both correctly rounded in either engine
    (functions/numeric.py). Dividing the quantized integer (instead
    of quantizing the quotient) keeps full double resolution at ANY
    weight scale: quantizing ln(u)/w itself collapses every row to
    es_key 0 once w ≳ 10⁶·|ln u| and silently degrades A-ES into
    ascending-key order. (es_key DESC, key ASC) is the total order,
    so both engines cut the same k rows.

    Weights must be > 0 (ln(u)/w flips sign for negative w and is
    engine-divergent for w = 0): enforced per-row IN the key
    expression via raise_error, so a bad weight fails loudly instead
    of silently corrupting the sample.

    Scale (100 TB): one scan; the weight/key math is per-row
    expression work and the fixed-k selection is TakeOrdered
    (per-partition heap + driver merge of k·partitions rows) — NO
    global sort, no shuffle of the corpus."""
    from shmr_spark.functions.numeric import _scaled_long

    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    u = (hash_split_col_md5(key, buckets) + F.lit(0.5)) / F.lit(float(buckets))
    q = _scaled_long(F.log(u))
    es_key = F.when(w > 0, q.cast("double") / w).otherwise(
        F.expr("raise_error('weighted_sample: weight must be > 0')").cast("double")
    )
    return (
        df.withColumn("es_key", es_key)
        .orderBy(F.col("es_key").desc(), F.col(key).asc())
        .limit(k)
    )
