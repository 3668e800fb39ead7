"""Similarity search + near-dup queries: brute-force cosine top-k
(oracle-checked vs DuckDB), embedding near-dup pairs, and the
rows-only MinHash/SimHash/LSH variants backed by shmr_spark.dedup /
shmr_spark.similarity.

Cross-engine float discipline: cosine is computed element-wise in
double on both sides and rounded to 6 decimals before any ordering or
filtering, so accumulation-order noise (~1e-15) can't flip the hash,
the top-k cut, or a threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.dedup import (
    embedding_near_duplicates,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from shmr_spark.functions.numeric import davg, sql_davg
from shmr_spark.functions.vectors import cosine_similarity
from shmr_spark.queries import query
from shmr_spark.queries.text import NEARDUP_PAIRS_SQL
from shmr_spark.similarity import cosine_topk_ivf, cosine_topk_lsh

_SQL_COS = (
    "round(list_cosine_similarity("
    "list_transform({a}, x -> CAST(x AS DOUBLE)), "
    "list_transform({b}, x -> CAST(x AS DOUBLE))), 6)"
)


@query(
    "similarity_topk",
    oracle=f"""
WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       {_SQL_COS.format(a='e.embedding', b='probe.p')} AS sim
FROM embeddings e, probe
WHERE e.vec_id <> 0
ORDER BY sim DESC, e.vec_id
LIMIT 10
""",
    headline=True,
)
def similarity_topk(spark, sf_dir):
    """Brute-force cosine top-k against a probe vector. The probe is a
    1-row broadcast cross join — no collect, no driver loop — and the
    top-k is TakeOrdered. This is the baseline ANN path; the LSH-bucket
    scale path is similarity_lsh_topk.

    The probe's norm is computed ONCE inside the 1-row broadcast
    relation (Catalyst cannot hoist a loop-invariant subexpression out
    of a per-row projection itself, so an inlined cosine_similarity
    re-aggregates the probe array for every corpus row — ~1/3 of the
    per-row flops for a constant). Same IEEE operations per row as
    before — dot/(sqrt(Σa²)·sqrt(Σp²)) with identical operand order —
    so results are bit-identical."""
    from shmr_spark.functions.vectors import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("p"), l2_norm("embedding").alias("__p_norm")
    )
    sim = F.round(
        dot(F.col("embedding"), F.col("p"))
        / (l2_norm(F.col("embedding")) * F.col("__p_norm")),
        6,
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", "label", sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "embedding_neardup",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_SQL_COS.format(a='a.embedding', b='b.embedding')} AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id % 25 = 0
  AND {_SQL_COS.format(a='a.embedding', b='b.embedding')} >= 0.35
""",
)
def embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs from a deterministic probe
    stratum (vec_id % 25 == 0) against the full table — the verify
    step of embedding dedup. At 100 TB the candidate pairs come from
    LSH buckets instead of a cross join (see dedup.embedding).

    tau=0.35, NOT a hygienic-looking 0.99: this corpus's max natural
    pairwise cosine is ~0.51, so any threshold above that returns
    zero rows and the gate greens vacuously — exactly what happened
    in round 2 (its 0-row green was the oldest "evidence" in the
    series) and what check_parity's VACUOUS guard now rejects.
    0.35 yields 14/21 real pairs at sf0.001/sf0.01; high-tau
    behavior stays covered by the planted-duplicate corpora in
    tests/test_dedup_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    sim = F.round(cosine_similarity(F.col("ea"), F.col("eb")), 6)
    return (
        a.filter(F.col("vec_a") % 25 == 0)
        .join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= 0.35)
    )


# --------------------------------------------------------------------------
# Approximate tiers, oracled by DEGENERATE-PARAMETER EQUIVALENCE: each
# gate runs the real bucketing/probing/rerank machinery with its
# pruning parameter at the no-prune extreme (Hamming radius = n_planes,
# n_probe = n_cells, rerank = corpus size), where the result provably
# equals exact search — which the brute-force DuckDB oracle computes.
# The APPROXIMATE settings (the production defaults) stay covered by
# pytest recall/equality pins in tests/test_dedup_similarity.py.
# --------------------------------------------------------------------------

_SQL_BRUTEFORCE_TOPK = f"""
WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       {_SQL_COS.format(a='e.embedding', b='probe.p')} AS sim
FROM embeddings e, probe
WHERE e.vec_id <> 0
ORDER BY sim DESC, e.vec_id
LIMIT 10
"""


@query(
    "similarity_indexed_topk",
    oracle=f"""
WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       {_SQL_COS.format(a='e.embedding', b='probe.p')} AS sim
FROM embeddings e, probe
WHERE e.vec_id <> 0
ORDER BY sim DESC, e.vec_id
LIMIT 10
""",
)
def similarity_indexed_topk(spark, sf_dir):
    """Persistent IVF index (similarity/index.py): corpus written
    partitionBy(cell) so probes prune at the storage layer. Run here
    at full probe (n_probe = n_cells), where the cells partition the
    corpus and the result provably equals exact search — which is what
    the brute-force oracle checks. The storage-prune plan shape is
    asserted in tests/test_dedup_similarity.py.

    Build-once-search-many: the index is cached on disk keyed by
    (corpus path, corpus mtime, index params) — exactly the economics
    the index exists for (a production ANN index is refreshed per
    corpus version, not per query). A regenerated corpus changes the
    mtime and forces a rebuild; repeated queries (and the bench's
    timed passes) measure SEARCH, with the one-time build paid on the
    first call."""
    import hashlib
    import os
    import tempfile

    from shmr_spark.similarity import build_ivf_index, search_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    probe_vec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    ]
    src = os.path.join(sf_dir, "embeddings.parquet")
    # full-precision mtime + size in the key: second-truncation could
    # alias two regenerations inside one second
    stat = os.stat(src)
    key = (
        f"{os.path.abspath(src)}|mt={stat.st_mtime!r}|sz={stat.st_size}"
        f"|cells=8|iters=2"
    )
    slug = hashlib.md5(key.encode()).hexdigest()[:12]
    base = tempfile.gettempdir()
    d = os.path.join(base, f"shmr_ivf_{slug}")
    marker = os.path.join(d, "_BUILT")

    def _marker_valid():
        try:
            with open(marker) as f:
                return f.read() == key
        except OSError:
            return False

    if not _marker_valid():
        import shutil
        import uuid

        # evict stale index versions of THIS corpus path (every
        # regeneration changes the mtime slug; without eviction each
        # one leaks a full index copy in tmp forever)
        prefix = f"{os.path.abspath(src)}|"
        for name in os.listdir(base):
            if not name.startswith("shmr_ivf_"):
                continue
            try:
                with open(os.path.join(base, name, "_BUILT")) as f:
                    k = f.read()
            except OSError:
                continue
            if k.startswith(prefix) and k != key:
                shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        # build into a private dir, then one atomic rename publishes
        # it — a concurrent builder can't hand a reader a
        # half-overwritten index; whoever loses the rename race uses
        # the winner's (identical, content-keyed) build
        tmpd = os.path.join(base, f".shmr_ivf_build_{uuid.uuid4().hex[:12]}")
        build_ivf_index(emb, tmpd, n_cells=8, kmeans_iters=2)
        with open(os.path.join(tmpd, "_BUILT"), "w") as f:
            f.write(key)
        try:
            os.rename(tmpd, d)
        except OSError:
            shutil.rmtree(tmpd, ignore_errors=True)
    out = search_ivf_index(spark, d, probe_vec, k=11, n_probe=8)
    rows = [r for r in out.collect() if r.vec_id != 0][:10]
    return spark.createDataFrame(rows, "vec_id long, sim double")


@query("similarity_lsh_topk", oracle=_SQL_BRUTEFORCE_TOPK)
def similarity_lsh_topk(spark, sf_dir):
    """Sign-LSH multi-probe search at full probe: Hamming radius =
    n_planes admits every bucket, so the bucketed path provably equals
    exact search (the oracle). Approximate radii (the default,
    multiprobe_hamming=1) are recall-pinned in pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(emb, probe_id=0, k=10, n_planes=6, multiprobe_hamming=6)


@query("similarity_ivf_topk", oracle=_SQL_BRUTEFORCE_TOPK)
def similarity_ivf_topk(spark, sf_dir):
    """IVF (hash-strata seed centroids) at full probe: n_probe =
    n_cells scans every cell, and the cells partition the corpus, so
    the result provably equals exact search. Approximate n_probe is
    recall-pinned >= 0.8 in tests/test_dedup_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(emb, probe_id=0, k=10, n_cells=16, n_probe=16, kmeans_iters=0)


@query("similarity_ivf_kmeans_topk", oracle=_SQL_BRUTEFORCE_TOPK)
def similarity_ivf_kmeans_topk(spark, sf_dir):
    """IVF with Lloyd-refined centroids (spherical k-means), full
    probe — exercises the k-means iteration machinery end-to-end under
    the exact-equivalence oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(
        emb, probe_id=0, k=10, n_cells=16, n_probe=16, kmeans_iters=3
    )


@query(
    "dedup_minhash",
    # the postings-join pair fragment (queries/text.py) — the jac
    # division is the same two ints cast to DOUBLE as the old
    # list_intersect form, so the value is bit-identical; this twin
    # ran 15 min in DuckDB at sf0.1 as an all-pairs join, seconds now
    oracle=f"""
WITH {NEARDUP_PAIRS_SQL}
SELECT u AS id_a, v AS id_b, jac AS jaccard FROM pairs
""",
)
def dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup pairs at single-row banding (bands =
    num_hashes = 64, r = 1): a pair is a candidate iff ANY of the 64
    minhashes agree — miss probability (1-j)^64 < 1e-19 at the 0.5
    threshold, and the exact-Jaccard verify step discards every false
    positive, so the output equals the all-pairs exact-Jaccard oracle
    (verified identical at sf0.001 and sf0.01; everything is fixed-
    seed deterministic). The production S-curve banding (16 bands x 4
    rows) is pytest-covered with planted duplicates."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(docs, threshold=0.5, num_hashes=64, bands=64)


_SQL_SIMHASH60 = """
SELECT doc_id, list_sum(list_transform(generate_series(0, 59), b ->
  CASE WHEN 2 * list_sum(list_transform(hashes, h ->
                CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE 0 END))
            >= len(hashes)
       THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS sig
FROM (
  SELECT doc_id, list_transform(string_split(text, ' '),
         t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hashes
  FROM documents
)
"""


@query(
    "dedup_simhash",
    oracle=f"""
WITH sigs AS ({_SQL_SIMHASH60})
SELECT id_a, id_b, hamming FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.sig, b.sig)) AS hamming
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
) WHERE hamming <= 3
""",
)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs under the cross-engine md5-based 60-bit
    signature (simhash60_md5): DuckDB computes the identical signature
    from the identical md5 token hashes, so the full pipeline —
    signature, 4-chunk pigeonhole blocking (exact for hamming <= 3),
    bit_count verify — is hash-checked against an all-pairs oracle.
    The xxhash64 production signature (simhash64) is pytest-covered."""
    from shmr_spark.dedup import simhash60_md5

    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_duplicates(
        docs, max_hamming=3, signature=simhash60_md5("text"), n_bits=60
    )


@query(
    "dedup_embedding_lsh",
    oracle=f"""
SELECT id_a, id_b, sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_SQL_COS.format(a='a.embedding', b='b.embedding')} AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE sim >= 0.4
""",
)
def dedup_embedding_lsh(spark, sf_dir):
    """Embedding near-dup pairs at n_planes=0 (single bucket = no
    pruning): the bucket equi-join admits every pair, so the
    LSH-block-then-verify machinery provably equals the all-pairs
    exact-cosine oracle. Threshold 0.4 because this corpus's max
    pairwise cosine is ~0.51 — a production 0.95 threshold would
    green-light on an empty result, which proves nothing. Approximate
    n_planes=8 blocking is pytest-covered."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(emb, threshold=0.4, n_planes=0)


@query(
    "dedup_semantic",
    oracle=f"""
SELECT e.vec_id, e.label
FROM embeddings e
WHERE NOT EXISTS (
  SELECT 1 FROM embeddings d
  WHERE d.vec_id < e.vec_id
    AND {_SQL_COS.format(a='d.embedding', b='e.embedding')} >= 0.4
)
ORDER BY e.vec_id
""",
)
def dedup_semantic_q(spark, sf_dir):
    """SemDeDup-style semantic dedup: the KEPT corpus after greedy
    smaller-id-wins pruning of >= tau cosine pairs. Gate runs the
    exact n_clusters=1 setting (provably equals the NOT EXISTS
    all-pairs oracle); the production k-means-clustered setting —
    the O(sum cell^2) scale path — is pinned by superset + recall
    tests in tests/test_dedup_similarity.py. tau=0.4 for the same
    corpus-sim reason as dedup_embedding_lsh above."""
    from shmr_spark.dedup.semantic import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    kept = semantic_dedup(emb, tau=0.4, n_clusters=1)
    return kept.select("vec_id", "label").orderBy("vec_id")


# --------------------------------------------------------------------------
# Batch kNN join: top-k neighbors for every probe in one job. Exact
# tier oracled via a DuckDB window over the cross join; LSH tier
# rows-only (bucket expansion not SQL-expressible).
# --------------------------------------------------------------------------


@query(
    "knn_join_exact",
    oracle=f"""
SELECT probe_id, neighbor_id, sim, rn FROM (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         {_SQL_COS.format(a='c.embedding', b='p.embedding')} AS sim,
         row_number() OVER (
           PARTITION BY p.vec_id
           ORDER BY {_SQL_COS.format(a='c.embedding', b='p.embedding')} DESC,
                    c.vec_id) AS rn
  FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
  WHERE p.vec_id % 100 = 0
) WHERE rn <= 5
""",
)
def knn_join_exact_q(spark, sf_dir):
    from shmr_spark.similarity.knn import knn_join_exact

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    return knn_join_exact(probes, emb, k=5)


@query(
    "knn_join_lsh",
    oracle=f"""
SELECT probe_id, neighbor_id, sim, rn FROM (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         {_SQL_COS.format(a='c.embedding', b='p.embedding')} AS sim,
         row_number() OVER (
           PARTITION BY p.vec_id
           ORDER BY {_SQL_COS.format(a='c.embedding', b='p.embedding')} DESC,
                    c.vec_id) AS rn
  FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
  WHERE p.vec_id % 100 = 0
) WHERE rn <= 5
""",
)
def knn_join_lsh_q(spark, sf_dir):
    """LSH kNN join at full probe: Hamming radius = n_planes expands
    every probe to all 2^8 bucket ids, so the bucket equi-join admits
    the whole corpus and the result provably equals the exact kNN
    join (same oracle as knn_join_exact). The pruned radius=1 tier is
    pytest-covered."""
    from shmr_spark.similarity.knn import knn_join_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    return knn_join_lsh(probes, emb, k=5, n_planes=8, radius=8)


# --------------------------------------------------------------------------
# Per-label centroids in long form (label, pos, centroid_val): the
# embedding-analytics primitive behind class prototypes, cluster
# quality checks, and IVF seeding. Long form keeps the oracle purely
# relational (DuckDB 1-based list indexing vs a range table) and the
# exact-decimal average keeps the hash stable across engines.
# --------------------------------------------------------------------------


@query(
    "label_centroids",
    oracle=f"""
SELECT label, pos, {sql_davg('embedding[pos]')} AS centroid_val, COUNT(*) AS n
FROM embeddings, range(1, 65) t(pos)
GROUP BY label, pos
""",
)
def label_centroids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "val"))
        .groupBy("label", (F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(davg("val").alias("centroid_val"), F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# int8 scalar quantization (functions/vectors.py): 4× smaller
# candidate-generation copy of the corpus. Long-form output keeps the
# oracle purely relational (per-element codes via DuckDB list ops).
# --------------------------------------------------------------------------


@query(
    "quantize_embeddings",
    oracle="""
SELECT vec_id, pos, code FROM (
  SELECT vec_id, t.pos AS pos,
         CAST(floor((CAST(embedding[t.pos] AS DOUBLE) - lo) / rng * 255.0 + 0.5)
              AS INT) AS code
  FROM (
    SELECT vec_id, embedding,
           CAST(list_min(embedding) AS DOUBLE) AS lo,
           CASE WHEN CAST(list_max(embedding) AS DOUBLE)
                     > CAST(list_min(embedding) AS DOUBLE)
                THEN CAST(list_max(embedding) AS DOUBLE)
                     - CAST(list_min(embedding) AS DOUBLE)
                ELSE 1.0 END AS rng
    FROM embeddings
  ), range(1, 65) t(pos)
)
WHERE vec_id < 100
""",
)
def quantize_embeddings(spark, sf_dir):
    from shmr_spark.functions.vectors import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return (
        emb.select("vec_id", quantize_int8("embedding").alias("codes"))
        .select("vec_id", F.posexplode("codes").alias("pos0", "code"))
        .select("vec_id", (F.col("pos0") + 1).cast("long").alias("pos"), "code")
    )


# --------------------------------------------------------------------------
# Higher-order array functions as per-vector stats: transform /
# filter / exists / aggregate, all JVM-side — no UDF, no explode.
# --------------------------------------------------------------------------


@query(
    "vector_stats",
    oracle="""
SELECT vec_id,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) ** 2),
             'sum'), 6) AS sq_norm,
       round(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 6)
         AS max_abs,
       CASE WHEN len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) > 0.3)) > 0
            THEN 1 ELSE 0 END AS has_large
FROM embeddings WHERE vec_id < 200
""",
)
def vector_stats(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_norm"),
        F.round(
            F.array_max(F.transform(dbl, lambda x: F.abs(x))), 6
        ).alias("max_abs"),
        F.when(
            F.exists(dbl, lambda x: F.abs(x) > 0.3), F.lit(1)
        ).otherwise(F.lit(0)).alias("has_large"),
    )


@query("similarity_quantized_rerank", oracle=_SQL_BRUTEFORCE_TOPK)
def similarity_quantized_rerank(spark, sf_dir):
    """Coarse int8 scan + exact rerank, at rerank = corpus size: every
    vector survives the coarse cut, so the exact-cosine rerank
    provably equals exact search (the oracle) while still exercising
    the quantize + coarse-score machinery. The pruned rerank=50 tier
    is equality-pinned in tests."""
    from shmr_spark.similarity import cosine_topk_quantized_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()  # parquet-footer count, one cheap job
    return cosine_topk_quantized_rerank(emb, probe_id=0, k=10, rerank=int(n))


def _probe_vector(emb, probe_id: int = 0) -> list[float]:
    """The single query vector, via a filtered 1-row first() — the
    only driver-side data in the PQ gates (bounded like the centroid
    collects; the codebook itself stays in-plan)."""
    row = emb.filter(F.col("vec_id") == probe_id).select("embedding").first()
    if row is None:
        raise ValueError(f"probe vec_id={probe_id} not in corpus")
    return [float(x) for x in row[0]]


@query("similarity_pq_topk", oracle=_SQL_BRUTEFORCE_TOPK)
def similarity_pq_topk(spark, sf_dir):
    """Product-quantized top-k at the degenerate-exact config: the
    codebook is the corpus's own subvectors (k = n), so every vector
    reconstructs exactly and PQ's lookup-table scoring provably equals
    brute-force cosine — the oracle. The compressed config (k=16,
    trained codebooks) is recall-pinned in tests, same split as the
    LSH/IVF gates. The degenerate codebook is built IN-PLAN
    (degenerate_codebook_df + pq_topk_df's joined lookup tables) —
    no corpus rows reach the driver; only the 1-row probe does.
    Production trains k=256 books via pq_train (driver sees only
    m·k·d_sub floats) and scores with constant-array pq_topk."""
    from shmr_spark.similarity.pq import (
        degenerate_codebook_df,
        pq_encode_df,
        pq_topk_df,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vector(emb)
    m = 4
    d_sub = len(probe) // m
    cb = degenerate_codebook_df(emb, m, d_sub)
    codes = pq_encode_df(emb.filter(F.col("vec_id") != 0), cb, m, d_sub)
    return pq_topk_df(codes, cb, probe, m, topk=10)


@query("similarity_ivfpq_topk", oracle=_SQL_BRUTEFORCE_TOPK)
def similarity_ivfpq_topk(spark, sf_dir):
    """The composed IVF+PQ production path at its degenerate-exact
    config: every cell probed (n_probe = n_cells) and codebook = the
    corpus's own subvectors (built in-plan, no driver collect of the
    corpus), so cell pruning drops nothing and PQ reconstruction is
    exact — the composition provably equals brute force. Pruned
    settings are recall-pinned in tests."""
    from shmr_spark.similarity.pq import cosine_topk_ivfpq, degenerate_codebook_df

    emb = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vector(emb)
    m = 4
    d_sub = len(probe) // m
    cb = degenerate_codebook_df(emb, m, d_sub)
    return cosine_topk_ivfpq(
        emb,
        probe,
        k=10,
        n_cells=8,
        n_probe=8,
        m=m,
        exclude_id=0,
        codebook_df=cb,
    )
