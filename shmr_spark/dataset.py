"""Dataset — the fluent operator surface mirroring the reference's
16-operator inventory (SURVEY.md §2) on a lazy Spark DataFrame.

Every method is a thin wrapper over the native Spark primitive the
SURVEY maps it to — never a per-line Python reimplementation — so the
whole chain stays one Catalyst logical plan: filters push down to the
parquet scan, aggregates get automatic partial+final stages, joins get
broadcast/sort-merge/shuffled-hash picked by the planner + AQE.

Reference operator → method map (citations are to /root/reference):

  partition.head          shmr/partition.py:35    .head(n)
  partition.count         shmr/partition.py:48    .count()
  partition.distinct      shmr/partition.py:83    .distinct(keys) / .distinct_first(keys, order)
  partition.apply         shmr/partition.py:102   .apply(fn)
  partition.map           shmr/partition.py:114   .map(**exprs) / .map_records(fn) [compat]
  partition.flat_map      shmr/partition.py:134   .flat_map(col) / .flat_map_records(fn) [compat]
  partition.filter        shmr/partition.py:154   .filter(cond)
  partition.reduce        shmr/partition.py:174   .reduce(*aggs)
  partition.reduce_by_key shmr/partition.py:206   .reduce_by_key(keys, *aggs)
  partition.split_by_key  shmr/partition.py:239   .split_by_key(key, n)
  partition.join          shmr/partition.py:263   .join(other, on, how) / .join_grouped(...)
  partitions.head/count   shmr/partitions.py:34/53  same methods (a Dataset is already a multi-file glob)
  partitions.coalesce     shmr/partitions.py:81   .coalesce(n) / .repartition(n)
  partitions.concat       shmr/partitions.py:125  .concat(other) / Dataset.concat_all(...)
  partitions.reduce       shmr/partitions.py:145  .reduce(*aggs) (global fold is the same agg)

The reference distinguishes per-file from whole-glob operators because
its parallelism is one OS process per file; Spark erases that split —
a Dataset is the whole (distributed) dataset and the planner handles
partitioning. The per-partition compat tier lives in
``shmr_spark.compat``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bounded_sort(df: DataFrame, *cols) -> DataFrame:
    """Globally sort a provably SMALL DataFrame (bounded-cardinality
    aggregate outputs). ``orderBy`` range-partitions, which runs a
    separate bounds-sampling job before the sort — pure fixed overhead
    when the result fits one partition at any data scale (e.g. TPC-H
    Q1's 6 flag×status groups). One coalesced partition + in-partition
    sort gives the same global order in one stage. Not for unbounded
    results: it serializes the sort onto a single task."""
    return df.coalesce(1).sortWithinPartitions(*cols)


class Dataset:
    """Lazy, composable dataset: wraps a DataFrame, returns Datasets.

    Construction: ``Dataset(df)`` or the readers in
    ``shmr_spark.sources``. ``.df`` exposes the underlying DataFrame at
    any point — the wrapper adds no materialization.
    """

    def __init__(self, df: DataFrame):
        self.df = df

    # -- plumbing ---------------------------------------------------------

    def _wrap(self, df: DataFrame) -> "Dataset":
        return Dataset(df)

    @property
    def schema(self):
        return self.df.schema

    def to_df(self) -> DataFrame:
        return self.df

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)

    # -- stateless record ops --------------------------------------------

    def head(self, n: int) -> "Dataset":
        """First n records (reference: positional limit, not top-k).
        Spark's limit is non-deterministic across partitions; pair with
        .sort() when a stable prefix is needed."""
        return self._wrap(self.df.limit(n))

    def count(self) -> int:
        """Record count. On parquet this is served from footer metadata
        (the Catalyst equivalent of the reference's .meta sidecar memo,
        /root/reference/shmr/partition.py:59-65)."""
        return self.df.count()

    def map(self, **exprs: Column) -> "Dataset":
        """Native map: project named Column expressions. Narrow, fully
        codegen'd; use .map_records for an opaque Python fn (compat)."""
        return self._wrap(self.df.select(*(e.alias(k) for k, e in exprs.items())))

    def with_columns(self, **exprs: Column) -> "Dataset":
        """Map that keeps existing columns (withColumn for each)."""
        return self._wrap(self.df.withColumns(dict(exprs)))

    def select(self, *cols) -> "Dataset":
        return self._wrap(self.df.select(*cols))

    def flat_map(self, col: Column | str, alias: str = "value", keep: Iterable[str] = ()) -> "Dataset":
        """Native flat_map: explode an array column — one output row
        per element (reference semantics: fn returns an iterable, each
        element its own record, /root/reference/shmr/partition.py:134-152)."""
        c = F.col(col) if isinstance(col, str) else col
        return self._wrap(self.df.select(*keep, F.explode(c).alias(alias)))

    def filter(self, cond: Column | str) -> "Dataset":
        """Keep records satisfying cond; pushed into the scan when the
        predicate allows."""
        return self._wrap(self.df.filter(cond))

    def apply(self, fn: Callable[[Any], None]) -> None:
        """Side-effect-only iteration (reference: no output partition,
        /root/reference/shmr/partition.py:102-112). Distributed foreach."""
        self.df.foreach(fn)

    def apply_partitions(self, fn: Callable[[Any], None]) -> None:
        """Side-effect iteration with one call per PARTITION (an
        iterator of rows) — the distributed form of the reference's
        apply over a whole partition file
        (/root/reference/shmr/partition.py:102-112: the fn sees every
        record of one file). Lets the side effect amortize per-split
        setup (open one sink connection/file per task, not per row)."""
        self.df.foreachPartition(fn)

    # -- dedup ------------------------------------------------------------

    def distinct(self, keys: list[str] | None = None) -> "Dataset":
        """Keep one record per key (whole-dataset dedup — a strict
        upgrade over the reference's per-file-only distinct). Which
        record survives is non-deterministic, like the reference's
        first-in-file-order under external parallelism."""
        return self._wrap(self.df.dropDuplicates(keys) if keys else self.df.distinct())

    def distinct_first(self, keys: list[str], order: list[Column | str]) -> "Dataset":
        """Deterministic first-occurrence-wins distinct (the reference's
        in-file semantics, /root/reference/shmr/partition.py:83-100, made
        order-explicit): min-by `order` within each key group via a
        window — one shuffle, same as any keyed dedup."""
        w = Window.partitionBy(*keys).orderBy(*order)
        return self._wrap(
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    # -- aggregation ------------------------------------------------------

    def reduce(self, *aggs: Column) -> "Dataset":
        """Global fold → one record (reference #8/#16). Native tier
        takes algebraic aggregate Columns; Spark computes partial
        per-partition + final merge automatically — the composition the
        reference user had to build by hand (SURVEY.md §3). For
        arbitrary (order-dependent) Python folds use compat.reduce_records."""
        return self._wrap(self.df.agg(*aggs))

    def reduce_by_key(self, keys: list[str] | list[Column], *aggs: Column) -> "Dataset":
        """Hash aggregation by key (reference #9). The reference's
        2-invocation idiom (partial reduce_by_key → split_by_key →
        final reduce_by_key) is exactly Spark's partial agg + exchange
        + final agg, planned from this single node."""
        return self._wrap(self.df.groupBy(*keys).agg(*aggs))

    def reduce_by_key_pandas(
        self, keys: list[str], fn: Callable, schema
    ) -> "Dataset":
        """Generic user-defined aggregation: one pandas DataFrame per
        key group (Arrow-batched). The slow-path escape hatch for folds
        that aren't expressible as algebraic aggregates."""
        return self._wrap(self.df.groupBy(*keys).applyInPandas(fn, schema))

    # -- partitioning -----------------------------------------------------

    def split_by_key(self, key: Column | str, num_partitions: int) -> "Dataset":
        """Hash-partition by key (reference #10: route record to bucket
        ``key % N``, /root/reference/shmr/partition.py:253-261). Native:
        one Exchange(HashPartitioning) — Spark's hash differs from
        CityHash64 but the grouping contract (co-location of equal
        keys) is identical, which is all downstream ops observe."""
        c = F.col(key) if isinstance(key, str) else key
        return self._wrap(self.df.repartition(num_partitions, c))

    def with_bucket(self, key: Column | str, num_partitions: int, alias: str = "bucket") -> "Dataset":
        """Materialize the reference's exact bucket id ``pmod(key, N)``
        as a column — used by the residue-invariant tests and by sinks
        that partition output directories by bucket."""
        c = F.col(key) if isinstance(key, str) else key
        return self._wrap(
            self.df.withColumn(alias, F.pmod(c.cast("long"), F.lit(num_partitions)).cast("int"))
        )

    def coalesce(self, num_partitions: int, shuffle: bool = False) -> "Dataset":
        """Re-chunk into n partitions (reference #14). Narrow coalesce
        by default; shuffle=True → repartition for even sizes (the
        reference's records_per_partition intent maps to
        ``maxRecordsPerFile`` at the sink, see sources.write_*)."""
        if shuffle:
            return self._wrap(self.df.repartition(num_partitions))
        return self._wrap(self.df.coalesce(num_partitions))

    def repartition(self, num_partitions: int, *cols) -> "Dataset":
        return self._wrap(self.df.repartition(num_partitions, *cols))

    def concat(self, *others: "Dataset") -> "Dataset":
        """UNION ALL (reference #15: byte-concatenate partitions). By
        name, so differently-ordered schemas still line up."""
        df = self.df
        for o in others:
            df = df.unionByName(o.df)
        return self._wrap(df)

    @staticmethod
    def concat_all(datasets: list["Dataset"]) -> "Dataset":
        head, *tail = datasets
        return head.concat(*tail)

    # -- joins ------------------------------------------------------------

    def join(
        self,
        other: "Dataset",
        on,
        how: str = "inner",
        broadcast_other: bool = False,
        merge_other: bool = False,
    ) -> "Dataset":
        """Relational equi-join — the *intended* semantics of reference
        #11 (which hash-joins two co-partitioned files; as shipped it
        crashes on any match, /root/reference/shmr/partition.py:315 —
        see SURVEY.md §2). All join types come free: inner/left/right/
        full/left_semi/left_anti/cross. Physical strategy is planner
        +AQE-chosen; pass broadcast_other=True to force broadcasting a
        known-small dimension, or merge_other=True to pin sort-merge
        when ``other`` is SF-PROPORTIONAL (a fact table): Catalyst's
        file-size estimate keeps such tables under the broadcast
        threshold far past the point where the driver-side hash build
        is the bottleneck (measured on q9: the orders broadcast WAS
        the whole 10× scale regression), and at real scale they can
        never broadcast at all."""
        if broadcast_other:
            right = F.broadcast(other.df)
        elif merge_other:
            right = other.df.hint("merge")
        else:
            right = other.df
        return self._wrap(self.df.join(right, on, how))

    def join_grouped(
        self,
        other: "Dataset",
        key: str,
        other_key: str,
        left_alias: str = "left",
        right_alias: str = "rights",
        merge_other: bool = False,
    ) -> "Dataset":
        """Reference #11's output *shape*: one row per key =
        [last-seen left record, [all matching right records]], inner
        (keys with no right match dropped) — see
        /root/reference/shmr/partition.py:300-323. Expressed natively:
        last(struct(left)) per key ⋈ collect_list(struct(right)) per
        key. Both sides pre-aggregate before the join, so the shuffle
        carries one row per key per side.

        Physical strategy is planner+AQE-chosen by default, mirroring
        ``join``'s ``merge_other`` opt-in: the grouped right side is
        one row per DISTINCT key, so when the aggregation collapses
        to few keys it is genuinely small and a broadcast is the
        right plan — an unconditional merge hint (as this method
        shipped through round 5) forbade that cheap case. Pass
        merge_other=True when the key cardinality is SF-proportional
        (e.g. grouping a fact by order key), where the size estimate
        would otherwise pick a fact-sized broadcast build."""
        lg = self.df.groupBy(F.col(key).alias("__k")).agg(
            F.last(F.struct(*self.df.columns)).alias(left_alias)
        )
        rg = other.df.groupBy(F.col(other_key).alias("__k")).agg(
            F.collect_list(F.struct(*other.df.columns)).alias(right_alias)
        )
        right = rg.hint("merge") if merge_other else rg
        return self._wrap(lg.join(right, "__k", "inner").drop("__k"))

    # -- sorts / top-k (free Spark extensions, SURVEY.md §2.4) -----------

    def sort(self, *cols) -> "Dataset":
        return self._wrap(self.df.orderBy(*cols))

    def sort_small(self, *cols) -> "Dataset":
        """Global sort for provably SMALL results (bounded-cardinality
        group-bys: status codes, nations, flags). orderBy plans a range
        shuffle whose partitioner runs a separate sampling job — pure
        overhead when the whole result fits one partition. This
        coalesces to one partition and sorts within it: same global
        order, one stage, no sampling pass (see ``bounded_sort``). Do
        NOT use on unbounded results; it serializes the sort onto one
        task."""
        return self._wrap(bounded_sort(self.df, *cols))

    def top_k(self, k: int, *order_cols) -> "Dataset":
        """Global top-k: orderBy + limit — planned as per-partition
        TakeOrdered + merge, no full sort materialization."""
        return self._wrap(self.df.orderBy(*order_cols).limit(k))

    def top_k_per_group(self, keys: list[str], k: int, order: list[Column]) -> "Dataset":
        w = Window.partitionBy(*keys).orderBy(*order)
        return self._wrap(
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    # -- reshaping / upsert ----------------------------------------------

    def pivot(self, key: str, pivot_col: str, values: list, agg: Column) -> "Dataset":
        """Wide-form: one column per pivot value (values listed
        explicitly — an unbounded pivot needs a pre-pass at scale)."""
        return self._wrap(self.df.groupBy(key).pivot(pivot_col, values).agg(agg))

    def unpivot(self, ids, value_cols: list[str], var_name: str = "metric", value_name: str = "value") -> "Dataset":
        """Long-form (melt): one row per (id, value column)."""
        return self._wrap(self.df.unpivot(ids, value_cols, var_name, value_name))

    def merge_upsert(self, updates: "Dataset", keys: list[str]) -> "Dataset":
        """MERGE INTO emulation (operators/merge.py): updates win on
        key match, new keys insert, the rest pass through."""
        from shmr_spark.operators.merge import merge_upsert

        return self._wrap(merge_upsert(self.df, updates.df, keys))
