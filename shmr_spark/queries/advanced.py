"""Advanced operators: as-of join, semi-structured JSON extraction,
skew-salted aggregation — each oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.dataset import bounded_sort
from shmr_spark.functions.numeric import dsum, sql_dquant, sql_dsum
from shmr_spark.operators import asof_join, salted_agg
from shmr_spark.queries import query

# --------------------------------------------------------------------------
# As-of join: each event ⟶ the user's most recent PRIOR event (strict).
# DuckDB has a native ASOF JOIN — the perfect oracle for our
# union+window composition (one shuffle, no inequality nested-loop).
# --------------------------------------------------------------------------


@query(
    "asof_join_prev",
    headline=True,
    oracle="""
SELECT e.event_id,
       e.user_id,
       CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_epoch,
       p.event_id AS event_id_asof,
       p.value AS value_asof
FROM events e
ASOF LEFT JOIN events p
  ON e.user_id = p.user_id AND e.ts > p.ts
""",
)
def asof_join_prev(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.select("user_id", "ts", "event_id", "value")
    joined = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        inclusive=False,
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        "event_id_asof",
        "value_asof",
    )


# --------------------------------------------------------------------------
# Forward as-of: each event ⟶ the user's EARLIEST LATER event — the
# same union+window carry scanning time in reverse (operators/asof.py
# direction="forward"), against DuckDB's native forward ASOF JOIN.
# --------------------------------------------------------------------------


@query(
    "asof_join_next",
    oracle="""
SELECT e.event_id,
       e.user_id,
       CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_epoch,
       p.event_id AS event_id_asof,
       p.value AS value_asof
FROM events e
ASOF LEFT JOIN events p
  ON e.user_id = p.user_id AND e.ts < p.ts
""",
)
def asof_join_next(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.select("user_id", "ts", "event_id", "value")
    joined = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        inclusive=False,
        tiebreak="event_id",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        "event_id_asof",
        "value_asof",
    )


# --------------------------------------------------------------------------
# Semi-structured: JSON props column → typed fields (the FIXTURES.md
# from_json target).
# --------------------------------------------------------------------------


@query(
    "json_extract_props",
    oracle=f"""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def json_extract_props(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).cast("long").alias("sum_k"), F.count("*").alias("n"))
        # a handful of event types at any SF: bounded sort
        .transform(bounded_sort, "event_type")
    )


# --------------------------------------------------------------------------
# Skew-salted aggregation — must be row-identical to the direct
# groupBy, which is exactly what the oracle asserts.
# --------------------------------------------------------------------------


@query(
    "salted_agg_revenue",
    oracle=f"""
SELECT l_returnflag,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(l_orderkey) AS n,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def salted_agg_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__rev", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
    )
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "revenue": ("dsum", "__rev"),
            "n": ("count", "l_orderkey"),
            "min_qty": ("min", "l_quantity"),
            "max_qty": ("max", "l_quantity"),
        },
        num_salts=8,
    )
    # 3 return flags at any SF: bounded sort (no range exchange)
    return bounded_sort(out, "l_returnflag")


# --------------------------------------------------------------------------
# Multimodal pipeline through the driver gate, REAL decode path: one
# deterministic PNG is planted per document (gray gradient pixel
# (doc_id + i) % 256, doc-dependent dims, per-row filter cycling
# through all five PNG filter types), then decoded by the stdlib PNG
# codec (multimodal/png.py) inside decode_and_featurize. The oracle
# recomputes the source-text byte length + sha256 AND the decoded
# width/height/pixel-checksum in closed form — so a hash match proves
# the distributed encode→decode round trip, not just the plumbing.
# Feature vectors are validated in tests/test_multimodal.py.
# --------------------------------------------------------------------------


@query(
    "multimodal_featurize",
    oracle="""
WITH base AS (
  SELECT doc_id,
         text,
         CAST(doc_id % 29 + 4 AS INT) AS width,
         CAST(doc_id % 17 + 4 AS INT) AS height,
         (doc_id % 29 + 4) * (doc_id % 17 + 4) AS n
  FROM documents
)
SELECT doc_id AS media_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256,
       width, height,
       CAST( ((doc_id + n) // 256) * 32640
             + ((doc_id + n) % 256) * ((doc_id + n) % 256 - 1) // 2
             - ( (doc_id // 256) * 32640
                 + (doc_id % 256) * (doc_id % 256 - 1) // 2 )
            AS BIGINT) AS px_sum
FROM base
""",
)
def multimodal_featurize(spark, sf_dir):
    from shmr_spark.multimodal import decode_and_featurize

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes_text"),
        F.sha2("text", 256).alias("sha256_text"),
    )

    def plant(it):
        import numpy as np
        import pandas as pd  # noqa: F401

        from shmr_spark.multimodal.png import png_encode

        for pdf in it:
            contents = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = mid % 29 + 4, mid % 17 + 4
                pix = ((mid + np.arange(w * h)) % 256).astype("uint8").reshape(h, w)
                contents.append(png_encode(pix, filter_mode="cycle"))
            yield pdf.assign(content=contents)

    planted = media.mapInPandas(
        plant,
        schema="media_id long, n_bytes_text long, sha256_text string, content binary",
    )
    feats = decode_and_featurize(
        planted,
        dim=16,
        use_real_decoder=True,
        passthrough=["n_bytes_text", "sha256_text"],
    )
    return feats.select(
        "media_id",
        F.col("n_bytes_text").alias("n_bytes"),
        F.col("sha256_text").alias("sha256"),
        "width",
        "height",
        "px_sum",
    )


# --------------------------------------------------------------------------
# JPEG through the driver gate, REAL decode path: one baseline JFIF
# image per document whose 8×8 blocks are each solid gray (value
# (doc_id + block_index) % 256) — such blocks entropy-code to DC-only
# coefficients and decode BIT-EXACTLY at quant=1 (multimodal/jpeg.py),
# so the oracle's closed-form pixel sum (the same S(d+n)-S(d)
# triangular identity as the PNG gate, ×64 pixels per block) checks
# real Huffman/DCT machinery, not plumbing. Non-solid content is
# near-lossless (±2) and covered in tests/test_multimodal.py.
# --------------------------------------------------------------------------


@query(
    "multimodal_jpeg_featurize",
    oracle="""
WITH base AS (
  SELECT doc_id,
         CAST(doc_id % 5 + 2 AS INT) AS bw,
         CAST(doc_id % 3 + 1 AS INT) AS bh,
         (doc_id % 5 + 2) * (doc_id % 3 + 1) AS nb
  FROM documents
)
SELECT doc_id AS media_id,
       bw * 8 AS width, bh * 8 AS height,
       CAST(64 * ( ((doc_id + nb) // 256) * 32640
                   + ((doc_id + nb) % 256) * ((doc_id + nb) % 256 - 1) // 2
                   - ( (doc_id // 256) * 32640
                       + (doc_id % 256) * (doc_id % 256 - 1) // 2 ) )
            AS BIGINT) AS px_sum
FROM base
""",
)
def multimodal_jpeg_featurize(spark, sf_dir):
    from shmr_spark.multimodal import decode_and_featurize

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(F.col("doc_id").alias("media_id"))

    def plant(it):
        import numpy as np

        from shmr_spark.multimodal.jpeg import jpeg_encode

        for pdf in it:
            contents = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                bw, bh = mid % 5 + 2, mid % 3 + 1
                block_vals = (mid + np.arange(bh * bw)) % 256
                img = np.kron(
                    block_vals.reshape(bh, bw), np.ones((8, 8), dtype=np.int64)
                ).astype(np.uint8)
                contents.append(jpeg_encode(img, quant=1))
            yield pdf.assign(content=contents)

    planted = media.mapInPandas(plant, schema="media_id long, content binary")
    feats = decode_and_featurize(planted, dim=8, use_real_decoder=True)
    return feats.select("media_id", "width", "height", "px_sum")


# --------------------------------------------------------------------------
# Audio through the driver gate, REAL decode path (the second real
# media format after PNG): one deterministic 16-bit PCM WAV is planted
# per document (samples v_i = (doc_id + i) % 256 - 128, doc-dependent
# length, 8 kHz mono), encoded with the stdlib wave writer, then
# decoded back by multimodal/wav.py inside featurize_audio. The
# oracle recomputes frame count, duration, and the exact sample sum in
# closed form (the same S(d+n) - S(d) triangular identity as the PNG
# px_sum oracle, shifted by -128·n) — a hash match proves the
# distributed encode→decode round trip on real RIFF bytes.
# --------------------------------------------------------------------------


@query(
    "multimodal_audio_featurize",
    oracle="""
WITH base AS (
  SELECT doc_id, CAST((doc_id % 37 + 3) * 50 AS BIGINT) AS n FROM documents
)
SELECT doc_id AS media_id,
       CAST(8000 AS INT) AS sample_rate,
       n AS n_samples,
       n * 1000 // 8000 AS duration_ms,
       CAST( ((doc_id + n) // 256) * 32640
             + ((doc_id + n) % 256) * ((doc_id + n) % 256 - 1) // 2
             - ( (doc_id // 256) * 32640
                 + (doc_id % 256) * (doc_id % 256 - 1) // 2 )
             - 128 * n
            AS BIGINT) AS sample_sum
FROM base
""",
)
def multimodal_audio_featurize(spark, sf_dir):
    from shmr_spark.multimodal import featurize_audio

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(F.col("doc_id").alias("media_id"))

    def plant(it):
        import numpy as np

        from shmr_spark.multimodal.wav import wav_encode

        for pdf in it:
            contents = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = (mid % 37 + 3) * 50
                samples = ((mid + np.arange(n)) % 256).astype(np.int32) - 128
                contents.append(wav_encode(samples, sample_rate=8000))
            yield pdf.assign(content=contents)

    planted = media.mapInPandas(plant, schema="media_id long, content binary")
    feats = featurize_audio(planted, dim=8)
    return feats.select(
        "media_id", "sample_rate", "n_samples", "duration_ms", "sample_sum"
    )


# --------------------------------------------------------------------------
# Deterministic sampling: exact stratified sample is SQL-expressible;
# the md5-bucket train/test split is oracle-checked (hash_split_col_md5
# is reproducible in DuckDB); the xxhash64 production split keeps its
# invariants pinned in tests/test_sampling.py.
# --------------------------------------------------------------------------


@query(
    "stratified_sample",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
) WHERE rn <= CAST(ceil(n * 0.05) AS BIGINT)
""",
)
def stratified_sample(spark, sf_dir):
    from shmr_spark.operators.sampling import stratified_sample_exact

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber"
    )
    return stratified_sample_exact(
        li, ["l_returnflag"], 0.05, ["l_orderkey", "l_linenumber"]
    )


@query(
    "train_test_split",
    oracle="""
SELECT CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                 % 10000 < 2000
            THEN 'test' ELSE 'train' END AS split,
       doc_id
FROM documents
ORDER BY doc_id
""",
)
def train_test_split_q(spark, sf_dir):
    """Hash-split on the cross-engine md5 bucket (hash_split_col_md5)
    so DuckDB reproduces the EXACT split assignment, not just the
    fractions. The xxhash64 production split is pytest-covered."""
    from shmr_spark.operators.sampling import hash_split_col_md5, train_test_split

    docs = load_table(spark, sf_dir, "documents")
    train, test = train_test_split(
        docs, "doc_id", test_fraction=0.2,
        split_col=hash_split_col_md5("doc_id"),
    )
    return (
        train.select(F.lit("train").alias("split"), "doc_id")
        .unionByName(test.select(F.lit("test").alias("split"), "doc_id"))
        .orderBy("doc_id")
    )


@query(
    "weighted_sample_quality",
    oracle="""
WITH s AS (
  SELECT doc_id, n_chars,
         CAST(CAST(floor(ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                                  AS BIGINT) % 1048576 + 0.5) / 1048576.0)
                         * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE)
             / CAST(n_chars AS DOUBLE) AS es_key
  FROM documents)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, es_key
FROM s ORDER BY es_key DESC, doc_id LIMIT 100
""",
)
def weighted_sample_quality(spark, sf_dir):
    """Efraimidis–Spirakis exact-size weighted sample: keep 100
    documents with inclusion chances proportional to length
    (operators/sampling.weighted_sample) — deterministic md5-uniform
    u, ln(u) floor-quantized ONCE over its fixed 2^20-value
    population, divided by the raw weight in full double precision,
    fixed-k TakeOrdered. The oracle replays the identical
    integer/ln/divide pipeline; the fixed population's exhaustive
    boundary margin is pinned in tests/test_edge_cases.py."""
    from shmr_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )
    return weighted_sample(docs, "doc_id", "n_chars", k=100)


# --------------------------------------------------------------------------
# Unpivot (melt) — wide → long, the inverse of pivot_agg.
# --------------------------------------------------------------------------


@query(
    "unpivot_melt",
    oracle="""
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part
""",
)
def unpivot_melt(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retail"),
    ).unpivot("p_partkey", ["size", "retail"], "metric", "value")


# --------------------------------------------------------------------------
# Histogram — fixed-width binning, identical bucket arithmetic on both
# engines (floor of identical double ops).
# --------------------------------------------------------------------------


@query(
    "histogram",
    oracle="""
SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin, COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY 1
""",
)
def histogram(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("long").alias("bin")
        )
        .agg(F.count("*").alias("n"))
        # bin count is bounded by the price domain (~a dozen 50k-wide
        # bins at any SF): bounded sort (no range exchange)
        .transform(bounded_sort, "bin")
    )


# --------------------------------------------------------------------------
# MERGE INTO emulation: updates (10% price bump for every 100th order,
# plus two brand-new orders) upserted into orders. The oracle builds
# the same result relationally.
# --------------------------------------------------------------------------


@query(
    "merge_upsert",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(o_totalprice * 1.1 AS DOUBLE) AS o_totalprice,
         CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT * FROM (VALUES
    (900000001, 1, 'O', CAST(100.0 AS DOUBLE), DATE '2001-01-01', 'NEW'),
    (900000002, 2, 'O', CAST(200.0 AS DOUBLE), DATE '2001-01-02', 'NEW'))
)
SELECT * FROM updates
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
""",
)
def merge_upsert_q(spark, sf_dir):
    from shmr_spark.operators.merge import merge_upsert

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.to_date("o_orderdate").alias("o_orderdate"),
        "o_orderpriority",
    )
    bumped = orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", (F.col("o_totalprice") * 1.1).cast("double")
    )
    new_rows = spark.createDataFrame(
        [
            (900000001, 1, "O", 100.0, "2001-01-01", "NEW"),
            (900000002, 2, "O", 200.0, "2001-01-02", "NEW"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    updates = bumped.unionByName(new_rows)
    return merge_upsert(orders, updates, ["o_orderkey"])


# --------------------------------------------------------------------------
# Data profiling: one-pass per-column stats, unpivoted to long form.
# Oracled on an int/string table (double→string rendering differs
# between engines, so the oracle table avoids float columns; the
# operator itself takes any schema).
# --------------------------------------------------------------------------


@query(
    "profile_columns",
    oracle="""
SELECT 'n_nationkey' AS "column", COUNT(*) AS n,
       CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT n_nationkey) AS n_distinct,
       MIN(CAST(n_nationkey AS VARCHAR)) AS min_str,
       MAX(CAST(n_nationkey AS VARCHAR)) AS max_str
FROM nation
UNION ALL
SELECT 'n_name', COUNT(*),
       CAST(SUM(CASE WHEN n_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT n_name), MIN(n_name), MAX(n_name)
FROM nation
UNION ALL
SELECT 'n_regionkey', COUNT(*),
       CAST(SUM(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT n_regionkey),
       MIN(CAST(n_regionkey AS VARCHAR)), MAX(CAST(n_regionkey AS VARCHAR))
FROM nation
""",
)
def profile_columns_q(spark, sf_dir):
    from shmr_spark.operators.profile import profile_columns

    nation = load_table(spark, sf_dir, "nation")
    return profile_columns(nation)


# --------------------------------------------------------------------------
# Salted join (operators/skew.py): hot-key-proof equi-join, verified
# row-identical to the plain join by the oracle.
# --------------------------------------------------------------------------


@query(
    "salted_join_revenue",
    oracle=f"""
SELECT s_nationkey, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
""",
)
def salted_join_revenue(spark, sf_dir):
    from shmr_spark.functions.numeric import dsum
    from shmr_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(li, sup, on="s_suppkey", num_salts=8)
    return joined.groupBy("s_nationkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# Declarative data-quality audit (operators/validate.py): N rules,
# one scan.
# --------------------------------------------------------------------------


@query(
    "validate_orders",
    oracle="""
SELECT 'price_positive' AS rule,
       CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
       COUNT(*) AS n_rows
FROM orders
UNION ALL
SELECT 'status_known',
       CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END) AS BIGINT),
       COUNT(*)
FROM orders
UNION ALL
SELECT 'date_in_range',
       CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1990-01-01 00:00:00'
                 AND o_orderdate < TIMESTAMP '2010-01-01 00:00:00'
                THEN 0 ELSE 1 END) AS BIGINT),
       COUNT(*)
FROM orders
""",
)
def validate_orders(spark, sf_dir):
    from shmr_spark.operators.validate import validate

    orders = load_table(spark, sf_dir, "orders")
    return validate(
        orders,
        {
            "price_positive": F.col("o_totalprice") > 0,
            "status_known": F.col("o_orderstatus").isin("O", "F", "P"),
            "date_in_range": (F.col("o_orderdate") >= F.lit("1990-01-01 00:00:00"))
            & (F.col("o_orderdate") < F.lit("2010-01-01 00:00:00")),
        },
    )


# --------------------------------------------------------------------------
# GROUPING SETS — the general form behind rollup/cube, via the SQL
# API on both engines; grouping() flags disambiguate the NULL rows.
# --------------------------------------------------------------------------


@query(
    "grouping_sets_agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def grouping_sets_agg(spark, sf_dir):
    from shmr_spark.functions.numeric import sql_dsum as _d

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               {_d('l_quantity')} AS sum_qty, COUNT(*) AS n,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


# --------------------------------------------------------------------------
# Grouped custom aggregation via applyInPandas — the Arrow grouped-map
# escape hatch for aggregates Catalyst can't express (here: median
# absolute deviation). One shuffle on the group key; each group is a
# pandas DataFrame in the worker. Oracled: numpy's interpolated median
# ≡ DuckDB quantile_cont(0.5) on identical doubles.
# --------------------------------------------------------------------------


@query(
    "grouped_mad",
    oracle="""
SELECT l_returnflag,
       median(abs(l_extendedprice - m)) AS mad,
       COUNT(*) AS n
FROM (
  SELECT l_returnflag, l_extendedprice,
         median(l_extendedprice) OVER (PARTITION BY l_returnflag) AS m
  FROM lineitem
)
GROUP BY l_returnflag
""",
)
def grouped_mad(spark, sf_dir):
    import pandas as pd

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf["l_extendedprice"].median()
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "mad": [(pdf["l_extendedprice"] - med).abs().median()],
                "n": [len(pdf)],
            }
        )

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    return li.groupBy("l_returnflag").applyInPandas(
        mad, schema="l_returnflag string, mad double, n long"
    )


# --------------------------------------------------------------------------
# Cogroup via applyInPandas: both sides grouped on the key, each
# group-pair handed to pandas — the general two-input custom operator
# (reconciliation, per-key merges Catalyst can't express). One shuffle
# per side. Oracled against the relational equivalent.
# --------------------------------------------------------------------------


@query(
    "cogroup_reconcile",
    oracle=f"""
WITH o AS (
  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
         {sql_dsum('o_totalprice')} AS sum_orders
  FROM orders GROUP BY o_custkey
),
l AS (
  SELECT o_custkey AS custkey, COUNT(*) AS n_items,
         {sql_dsum('l_extendedprice')} AS sum_items
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
)
SELECT COALESCE(o.custkey, l.custkey) AS custkey,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(sum_orders, 0.0) AS sum_orders,
       COALESCE(n_items, 0) AS n_items,
       COALESCE(sum_items, 0.0) AS sum_items
FROM o FULL OUTER JOIN l ON o.custkey = l.custkey
""",
)
def cogroup_reconcile(spark, sf_dir):
    import pandas as pd

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("custkey"), "l_extendedprice")
    )

    def reconcile(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        def dsum_py(s):
            import math

            return float(sum(int(math.floor(v * 1e6 + 0.5)) for v in s)) / 1e6

        return pd.DataFrame(
            {
                "custkey": [key[0]],
                "n_orders": [len(odf)],
                "sum_orders": [dsum_py(odf["o_totalprice"])],
                "n_items": [len(ldf)],
                "sum_items": [dsum_py(ldf["l_extendedprice"])],
            }
        )

    return (
        orders.groupBy("custkey")
        .cogroup(li.groupBy("custkey"))
        .applyInPandas(
            reconcile,
            schema="custkey long, n_orders long, sum_orders double,"
            " n_items long, sum_items double",
        )
    )


# --------------------------------------------------------------------------
# VARIANT (Spark 4 semi-structured type): parse once, extract with
# variant_get — the open-schema path that replaces per-access JSON
# string parsing (get_json_object) at scale.
# --------------------------------------------------------------------------


@query(
    "variant_extract",
    oracle="""
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events WHERE event_id < 200
""",
)
def variant_extract(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
    )


# --------------------------------------------------------------------------
# Python UDTF (Spark 4): one input row → many output rows with
# per-row state, via LATERAL — the table-function escape hatch.
# Arrow-batched like pandas UDFs.
# --------------------------------------------------------------------------


@query(
    "udtf_sentences",
    oracle="""
SELECT doc_id, CAST(generate_subscripts(string_split(text, ' data '), 1) AS INT) AS pos,
       unnest(string_split(text, ' data ')) AS sentence
FROM documents WHERE doc_id < 20
""",
)
def udtf_sentences(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, sentence STRING")
    class SplitSentences:
        def eval(self, text: str):
            for i, s in enumerate(text.split(" data ")):
                yield i + 1, s

    spark.udtf.register("shmr_split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("docs_udtf_v")
    return spark.sql(
        """
        SELECT doc_id, s.pos, s.sentence
        FROM docs_udtf_v, LATERAL shmr_split_sentences(text) s
        """
    )


# --------------------------------------------------------------------------
# Fuzzy record linkage: blocked levenshtein self-join — block on a
# name prefix (equi-join, no cross product), verify with edit
# distance ≤ 1 inside each block. The blocking-key pattern is the
# scalable shape of entity resolution. Production caveat: audit the
# block-key cardinality on real data — a degenerate key (here, TPC-H's
# sequential "Customer#..." prefixes collide heavily) concentrates a
# block and re-quadratizes the verify; pick keys (phonetic codes,
# name+zip) whose biggest block stays bounded, or salt oversized
# blocks (operators/skew.py).
# --------------------------------------------------------------------------


@query(
    "fuzzy_name_pairs",
    oracle="""
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a JOIN customer b
  ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""",
)
def fuzzy_name_pairs(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = cust.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        F.substring("c_name", 1, 16).alias("__blk"),
    )
    b = cust.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        F.substring("c_name", 1, 16).alias("__blk"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b.hint("merge"), "__blk")  # customer self-join: sort-merge
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(dist <= 1)
        .select("key_a", "key_b", dist.alias("dist"))
    )


# --------------------------------------------------------------------------
# Daily-activity bitmaps: one int64 per user, bit d set iff the user
# was active on day-of-month d — bit_or aggregate; retention/streak
# analytics read the bitmap with bit ops instead of re-scanning
# events.
# --------------------------------------------------------------------------


@query(
    "activity_bitmaps",
    oracle="""
SELECT user_id,
       bit_or(CAST(1 AS BIGINT) << CAST(day(ts) AS INT)) AS days_bitmap,
       COUNT(DISTINCT day(ts)) AS n_days
FROM events
GROUP BY user_id
""",
)
def activity_bitmaps(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # shiftleft's numBits is int-only in the Python API → SQL expr
    day_bit = F.expr("shiftleft(CAST(1 AS BIGINT), day(ts))")
    return ev.groupBy("user_id").agg(
        F.bit_or(day_bit).alias("days_bitmap"),
        F.countDistinct(F.dayofmonth("ts")).alias("n_days"),
    )


# --------------------------------------------------------------------------
# Referential-integrity audit: both orphan directions in one result —
# anti-joins as NOT EXISTS, the FK health check of a star schema.
# --------------------------------------------------------------------------


@query(
    "referential_integrity",
    oracle="""
SELECT 'orders_without_items' AS chk, COUNT(*) AS n
FROM orders o WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
UNION ALL
SELECT 'items_without_order', COUNT(*)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_without_customer', COUNT(*)
FROM orders o WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
""",
)
def referential_integrity(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    def orphans(name, left, right, lk, rk):
        n = (
            # fact-fact anti joins (orders/lineitem/customer): sort-merge
            left.join(right.hint("merge"), left[lk] == right[rk], "left_anti")
            .agg(F.count("*").alias("n"))
            .select(F.lit(name).alias("chk"), "n")
        )
        return n

    return (
        orphans("orders_without_items", orders, li, "o_orderkey", "l_orderkey")
        .unionByName(orphans("items_without_order", li, orders, "l_orderkey", "o_orderkey"))
        .unionByName(orphans("orders_without_customer", orders, cust, "o_custkey", "c_custkey"))
    )


# --------------------------------------------------------------------------
# Boolean / conditional aggregate surface: count_if, bool_and,
# bool_or, every/some in one audit-style result per group.
# --------------------------------------------------------------------------


@query(
    "bool_aggregates",
    oracle="""
SELECT o_orderstatus,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
""",
)
def bool_aggregates(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
# match each other — the semantics regular equi-joins silently drop.
# --------------------------------------------------------------------------


@query(
    "null_safe_join",
    oracle="""
WITH keyed AS (
  SELECT p_partkey, CASE WHEN p_size % 10 = 0 THEN NULL ELSE p_size END AS k
  FROM part
)
SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b
FROM keyed a JOIN keyed b
  ON a.k IS NOT DISTINCT FROM b.k AND a.p_partkey < b.p_partkey
WHERE a.k IS NULL
""",
)
def null_safe_join(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    keyed = part.select(
        "p_partkey",
        F.when(F.col("p_size") % 10 != 0, F.col("p_size")).alias("k"),
    )
    a = keyed.select(F.col("p_partkey").alias("pk_a"), F.col("k").alias("ka"))
    b = keyed.select(F.col("p_partkey").alias("pk_b"), F.col("k").alias("kb"))
    return (
        a.join(b, F.col("ka").eqNullSafe(F.col("kb")) & (F.col("pk_a") < F.col("pk_b")))
        .filter(F.col("ka").isNull())
        .select("pk_a", "pk_b")
    )


# --------------------------------------------------------------------------
# Beyond-int64 exact aggregation: the dsum_dec decimal escape hatch,
# exercised END-TO-END at a magnitude where the scaled-int64 fast path
# (functions/numeric.py) would overflow. The per-row expression
# l_extendedprice * 10000.0 is one IEEE double multiply — bit-identical
# on both engines — and its sf0.01 sum is ~2.3e13, past the ~9.2e12
# int64-scaled cap (dsum on this expression raises; pytest pins that).
# The arithmetic STAYS DECIMAL internally — DuckDB's int128→double
# cast rounds twice (module docstring of functions/numeric.py), so a
# double-cast twin would be a false mismatch — but the OUTPUT column
# is cast to string on both sides: the driver harness canonicalizes
# via pandas, where DuckDB `.df()` lowers DECIMAL to float64 while
# Spark `toPandas()` keeps Decimal objects, so a DECIMAL output
# column hash-mismatches on representation alone. Gate-output rule:
# primitive scalars only (no DECIMAL/ARRAY/MAP/STRUCT) — enforced by
# tests/test_gate_schemas.py.
# --------------------------------------------------------------------------


@query(
    "dsum_decimal_overflow",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice * 10000.0 AS DECIMAL(28,6))) AS VARCHAR)
         AS big_sum,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def dsum_decimal_overflow(spark, sf_dir):
    from shmr_spark.functions.numeric import dsum_dec

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum_dec(F.col("l_extendedprice") * F.lit(10000.0))
        .cast("string")
        .alias("big_sum"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# Multimodal RESIZE through the driver gate, real codec path: plant a
# block-constant PNG per document (8x8 solid blocks, values
# (doc_id + i) % 256 — the same construction as the JPEG gate), then
# decode → nearest-neighbor halve → re-encode PNG in one mapInPandas
# stage (multimodal/resize.py). Halving an 8x8-solid-block image with
# the floor mapping picks even pixel indices, so each block becomes a
# 4x4 solid block of the SAME value: resized px_sum = 16 * Σ block
# values — the same triangular-sum identity as the featurize oracles,
# with factor 16 instead of 64. A hash match proves the distributed
# decode→resample→encode round trip, not just metadata plumbing.
# --------------------------------------------------------------------------


@query(
    "multimodal_resize",
    oracle="""
WITH base AS (
  SELECT doc_id,
         CAST(doc_id % 5 + 2 AS INT) AS bw,
         CAST(doc_id % 3 + 1 AS INT) AS bh,
         (doc_id % 5 + 2) * (doc_id % 3 + 1) AS nb
  FROM documents
)
SELECT doc_id AS media_id,
       bw * 4 AS width, bh * 4 AS height,
       CAST(16 * ( ((doc_id + nb) // 256) * 32640
                   + ((doc_id + nb) % 256) * ((doc_id + nb) % 256 - 1) // 2
                   - ( (doc_id // 256) * 32640
                       + (doc_id % 256) * (doc_id % 256 - 1) // 2 ) )
            AS BIGINT) AS px_sum
FROM base
""",
)
def multimodal_resize(spark, sf_dir):
    from shmr_spark.multimodal.resize import resize_images

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(F.col("doc_id").alias("media_id"))

    def plant(it):
        import numpy as np

        from shmr_spark.multimodal.png import png_encode

        for pdf in it:
            contents = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                bw, bh = mid % 5 + 2, mid % 3 + 1
                block_vals = (mid + np.arange(bh * bw)) % 256
                img = np.kron(
                    block_vals.reshape(bh, bw), np.ones((8, 8), dtype=np.int64)
                ).astype(np.uint8)
                contents.append(png_encode(img))
            yield pdf.assign(content=contents)

    planted = media.mapInPandas(plant, schema="media_id long, content binary")
    resized = resize_images(planted, factor=0.5)
    return resized.select("media_id", "width", "height", "px_sum")


# --------------------------------------------------------------------------
# Iterative graph analytics through the gate: 2 PageRank rounds over
# the symmetrized customer<->supplier trade graph. The float
# iteration carries a hash oracle via the determinism discipline in
# operators/graph.py (per-round 6-decimal rounding + dsum inflow) —
# the DuckDB twin unrolls the same two rounds as CTEs.
# --------------------------------------------------------------------------

_PR_INFLOW = sql_dsum("r.rank / d.d")

# dquant, not round(): DuckDB's round(DOUBLE, 6) and Spark's disagree
# by 1 ulp on boundary values — caught by the round-9 sf0.1 parity
# sweep (one node: 3.061275 vs 3.061276); see functions/numeric.dquant
_PR_RANK = sql_dquant("CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * COALESCE(i.v, 0)")

_PAGERANK_ORACLE = f"""
WITH e0 AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), edges AS (
  SELECT 'c' || CAST(c AS VARCHAR) AS src, 's' || CAST(s AS VARCHAR) AS dst FROM e0
  UNION ALL
  SELECT 's' || CAST(s AS VARCHAR), 'c' || CAST(c AS VARCHAR) FROM e0
), deg AS (
  SELECT src, count(*) AS d FROM edges GROUP BY src
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst FROM edges
), r0 AS (
  SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes
), r1 AS (
  SELECT n.node,
         {_PR_RANK} AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, {_PR_INFLOW} AS v
    FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) i ON n.node = i.node
), r2 AS (
  SELECT n.node,
         {_PR_RANK} AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, {_PR_INFLOW} AS v
    FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) i ON n.node = i.node
)
SELECT node, rank FROM r2 ORDER BY rank DESC, node LIMIT 20
"""


@query("pagerank_trade_graph", oracle=_PAGERANK_ORACLE)
def pagerank_trade_graph(spark, sf_dir):
    """Top-20 PageRank nodes of the customer<->supplier graph (edge =
    the pair traded, both directions so no node dangles). Per-round
    rounding + dsum make two engines' float iterations bit-identical
    — see operators/graph.py."""
    from shmr_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("cn"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("sn"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("cn").alias("src"), F.col("sn").alias("dst")).union(
        pairs.select(F.col("sn").alias("src"), F.col("cn").alias("dst"))
    )
    ranks = pagerank(edges, iters=2)
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(20)


@query(
    "triangle_count_trade",
    oracle="""
WITH e0 AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), pe AS (
  SELECT DISTINCT 'c' || CAST(c AS VARCHAR) AS u, 's' || CAST(s AS VARCHAR) AS v
  FROM e0
), ss AS (
  SELECT DISTINCT a.v AS x, b.v AS y FROM pe a JOIN pe b ON a.u = b.u AND a.v < b.v
), e AS (
  SELECT CASE WHEN u < v THEN u ELSE v END AS lo,
         CASE WHEN u < v THEN v ELSE u END AS hi FROM pe
  UNION
  SELECT x, y FROM ss
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e ab JOIN e bc ON ab.hi = bc.lo JOIN e ac
  ON ac.lo = ab.lo AND ac.hi = bc.hi
""",
)
def triangle_count_trade(spark, sf_dir):
    """Triangles of the trade graph: customer-supplier edges plus
    supplier-supplier 'co-traded with the same customer' edges (a
    pure bipartite graph has no triangles, so the projection edge set
    makes the count meaningful). Oracle repeats the same
    canonicalized two-join count in SQL.

    Vertices are encoded as LONGS (even = customer, odd = supplier),
    not "c{id}"/"s{id}" strings: the wedge stage shuffles ~1.8B rows
    at the 10× corpus and 8-byte fixed keys roughly halve that
    shuffle's bytes vs short strings. The count is encoding-invariant
    (any injective vertex id and any total order canonicalize the
    same triangles), so the string-keyed oracle still matches."""
    from shmr_spark.operators.graph import triangle_count

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey").cast("long") * 2).alias("u"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    a = pairs.select(F.col("u").alias("cu"), F.col("v").alias("x"))
    b = pairs.select(F.col("u").alias("cu"), F.col("v").alias("y"))
    supp_pairs = (
        a.join(b, "cu")
        .filter(F.col("x") < F.col("y"))
        .select(F.col("x").alias("src"), F.col("y").alias("dst"))
        .distinct()
    )
    edges = pairs.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        supp_pairs
    )
    return triangle_count(edges)


# --------------------------------------------------------------------------
# Sequence-gap detection (operators/validate.py missing_ranges): holes
# in the open-order key sequence. The engine buckets the lag window so
# no global sort exists (only a bucket summary is globally ordered);
# the oracle is the direct single-window definition.
# --------------------------------------------------------------------------


@query(
    "missing_id_ranges",
    oracle="""
SELECT CAST(prev + 1 AS BIGINT) AS gap_start,
       CAST(k - 1 AS BIGINT) AS gap_end,
       CAST(k - prev - 1 AS BIGINT) AS n_missing
FROM (
  SELECT k, lag(k) OVER (ORDER BY k) AS prev
  FROM (SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS k
        FROM orders WHERE o_orderstatus = 'O')
)
WHERE k - prev > 1
""",
)
def missing_id_ranges(spark, sf_dir):
    from shmr_spark.operators.validate import missing_ranges

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return missing_ranges(orders, "o_orderkey")


# --------------------------------------------------------------------------
# Bloom-filter semi-join reduction: the fact side is pre-filtered by a
# broadcast bitmap over the dim keys BEFORE any exchange, then a real
# left_semi clears Bloom false positives — exact result, reduced
# shuffle (operators/bloom.py). The oracle is the plain IN-subquery
# the operator is provably equivalent to.
# --------------------------------------------------------------------------


@query(
    "bloom_semi_join_revenue",
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def bloom_semi_join_revenue(spark, sf_dir):
    """Revenue of lineitems supplied by nation 3 (non-empty at every gate SF), with the lineitem
    scan Bloom-reduced on l_suppkey before the confirming semi-join.
    Gate uses a 64 Kbit filter (1 Kword literal); production default
    is 1 Mbit (operators/bloom.py). mode="bloom" pins the reduction
    path itself — the auto regime guard would (correctly) pick the
    broadcast join for this gate-sized dim, and then the driver would
    never verify the bloom plan."""
    from shmr_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 3)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    kept = bloom_semi_join(li, supp, "l_suppkey", num_bits=1 << 16, mode="bloom")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
    return (
        kept.groupBy("l_returnflag")
        .agg(F.count("*").alias("n_items"), dsum(rev).alias("revenue"))
        # 3 return flags at any SF: bounded sort (no range exchange)
        .transform(bounded_sort, "l_returnflag")
    )


@query(
    "bloom_anti_join_revenue",
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def bloom_anti_join_revenue(spark, sf_dir):
    """Revenue of lineitems NOT supplied by nation 3: the anti
    direction of the Bloom reduction (operators/bloom.py
    bloom_anti_join) — probe-miss rows (~96% of the fact here) skip
    the confirming exchange as definite non-matches. NOT IN is a
    sound oracle because l_suppkey and s_suppkey are non-null in this
    corpus (left_anti KEEPS null-key rows where NOT IN drops them —
    bloom_anti_join follows left_anti; see its docstring).
    mode="bloom" pins the two-branch reduction plan — the auto regime
    guard would pick the broadcast join at gate scale."""
    from shmr_spark.operators.bloom import bloom_anti_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 3)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    kept = bloom_anti_join(li, supp, "l_suppkey", num_bits=1 << 16, mode="bloom")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
    return (
        kept.groupBy("l_returnflag")
        .agg(F.count("*").alias("n_items"), dsum(rev).alias("revenue"))
        # 3 return flags at any SF: bounded sort (no range exchange)
        .transform(bounded_sort, "l_returnflag")
    )
