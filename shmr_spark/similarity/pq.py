"""Product quantization (PQ) — the memory-scale tier of the ANN stack
(design: Jégou/Douze/Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — public literature).

Where int8 scalar quantization (functions/vectors.py) compresses 4×,
PQ compresses ``dim·4 bytes → m bytes`` (64-dim float32 → 4 bytes at
m=4): each vector is split into m subvectors, each encoded as the
index of its nearest codeword in a per-subspace codebook of k
centroids. At 100 TB the coarse scan then reads only the m-byte codes
and scores candidates from per-probe lookup tables — no float vectors
touched until an optional exact rerank.

Why cosine decomposes: dot(q, x) = Σⱼ dot(qⱼ, xⱼ) exactly, so the
asymmetric approximation replaces xⱼ with its codeword and reads
dot(qⱼ, c) from a k-entry table; ‖x‖ is likewise approximated from
codeword norms. Both tables are tiny Python-computed literals — the
scoring expression is pure codegen arithmetic, no joins, no UDFs.

Scale design per stage:
- training/encoding: the corpus joins a BROADCAST codebook frame
  (m·k rows) and takes a min_by per (row, subspace) — plain shuffle
  aggregates, no giant literal expressions, no driver loops over data;
- scoring: fixed-order element_at sums over constant arrays —
  deterministic double arithmetic, rounded to 6 decimals per the
  repo-wide cross-engine float discipline;
- the degenerate config (codebook := the corpus's own subvectors)
  reconstructs every vector exactly, making PQ scoring ≡ brute-force
  cosine — which is how the gate query carries an EXACT DuckDB oracle
  (the same full-probe ≡ exact trick as the LSH/IVF gates).

No reference analogue: /root/reference/shmr has no vector machinery;
this extends the similarity stack (search.py: brute force, LSH, IVF,
int8 rerank) with the compression tier between IVF and rerank.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shmr_spark.functions.vectors import lit_double_array


def _check_books(codebooks: list[list[list[float]]]) -> tuple[int, int]:
    m = len(codebooks)
    if m == 0 or not codebooks[0]:
        raise ValueError("codebooks must be non-empty: m lists of k centroids")
    d_sub = len(codebooks[0][0])
    for book in codebooks:
        for c in book:
            if len(c) != d_sub:
                raise ValueError("ragged codebook: all centroids need equal dim")
    return m, d_sub


def _codebook_df(spark, codebooks):
    rows = [
        (j, c, [float(x) for x in cent])
        for j, book in enumerate(codebooks)
        for c, cent in enumerate(book)
    ]
    return spark.createDataFrame(rows, "j int, code int, cvec array<double>")


def _subvectors(df: DataFrame, id_col: str, vec_col: str, m: int, d_sub: int):
    """Long form (id, j, sub): one row per subspace per vector."""
    structs = [
        F.struct(
            F.lit(j).alias("j"),
            F.transform(
                F.slice(F.col(vec_col), j * d_sub + 1, d_sub),
                lambda x: x.cast("double"),
            ).alias("sub"),
        )
        for j in range(m)
    ]
    # fail loudly on a mis-dimensioned vector: a short slice would
    # null-pad through zip_with and min_by would silently emit code 0
    # for every subspace (confidently-ranked garbage downstream)
    ok = F.coalesce(
        F.assert_true(
            F.size(F.col(vec_col)) == F.lit(m * d_sub),
            F.lit(f"PQ: vector length != m*d_sub = {m * d_sub}"),
        ).cast("boolean"),
        F.lit(True),
    )
    return (
        df.filter(ok)
        .select(id_col, F.explode(F.array(*structs)).alias("__e"))
        .select(id_col, F.col("__e.j").alias("j"), F.col("__e.sub").alias("sub"))
    )


_L2SQ = lambda a, b: F.aggregate(  # noqa: E731
    F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
    F.lit(0.0),
    lambda acc, v: acc + v,
)


def _nearest_codes(
    subs: DataFrame, cb: DataFrame, id_col: str, broadcast: bool = True
) -> DataFrame:
    """(id, j, code) of each subvector's L2-nearest codeword; ties
    break to the smallest code (min_by on the (distance, code) struct
    — deterministic). ``broadcast=True`` is right for trained
    codebooks (m·k rows); pass False when the codebook frame is
    corpus-derived (the degenerate gate config) so the planner picks
    the join strategy instead of force-shipping an SF-proportional
    side to every executor."""
    if broadcast:
        cb = F.broadcast(cb)
    return (
        subs.join(cb, "j")
        .select(
            id_col,
            "j",
            "code",
            _L2SQ(F.col("sub"), F.col("cvec")).alias("__d2"),
        )
        .groupBy(id_col, "j")
        .agg(F.min_by("code", F.struct("__d2", "code")).alias("code"))
    )


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subspace L2 codebooks: deterministic hash-strata
    seeds (the smallest-id subvector per stratum — same spread-seeding
    rationale as search._seed_centroids), then Lloyd rounds where
    assignment is the broadcast join above and the update is a plain
    (j, code, pos) average. Only m·k·d_sub floats reach the driver per
    iteration. Empty codes keep their previous centroid."""
    first = df.select(F.size(vec_col).alias("n")).first()
    if first is None:
        raise ValueError("cannot train PQ on an empty corpus")
    dim = first["n"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    spark = df.sparkSession

    subs = _subvectors(df, id_col, vec_col, m, d_sub)
    stratum = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(k))
    seeds = (
        subs.groupBy("j", stratum.cast("int").alias("__s"))
        .agg(F.min_by("sub", F.col(id_col)).alias("cvec"))
        .collect()
    )
    # stratum ids with no rows simply yield fewer than k codes — the
    # codebook is dense-reindexed per subspace
    books: list[dict[int, list[float]]] = [dict() for _ in range(m)]
    for r in seeds:
        books[r["j"]][r["__s"]] = [float(x) for x in r["cvec"]]
    current = [
        [v for _, v in sorted(b.items())] for b in books
    ]  # m × (≤k) × d_sub

    for _ in range(iters):
        cb = _codebook_df(spark, current)
        assigned = _nearest_codes(subs, cb, id_col)
        means = (
            subs.join(assigned, [id_col, "j"])
            .select("j", "code", F.posexplode("sub").alias("__p", "__v"))
            .groupBy("j", "code", "__p")
            .agg(F.avg("__v").alias("__m"))
            .groupBy("j", "code")
            .agg(
                F.array_sort(F.collect_list(F.struct("__p", "__m"))).alias("__pairs")
            )
            .select("j", "code", F.col("__pairs.__m").alias("cvec"))
            .collect()
        )
        for r in means:
            current[r["j"]][r["code"]] = [float(x) for x in r["cvec"]]
    return current


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length m): each vector compressed to
    its per-subspace nearest-codeword indices."""
    m, d_sub = _check_books(codebooks)
    cb = _codebook_df(df.sparkSession, codebooks)
    subs = _subvectors(df, id_col, vec_col, m, d_sub)
    return (
        _nearest_codes(subs, cb, id_col)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("j", "code"))).alias("__p"))
        .select(id_col, F.col("__p.code").alias("codes"))
    )


def degenerate_codebook_df(
    df: DataFrame,
    m: int,
    d_sub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The degenerate-exact codebook (codebook := the corpus's own
    subvectors, k = n) built IN-PLAN: (j, code, cvec) where code is
    the dense rank of ``id_col`` within each subspace — the same
    numbering the collect-and-sort construction produced, with zero
    rows touching the driver. With this codebook every vector's
    nearest codeword is itself (L2 distance 0), so PQ reconstruction
    is exact and lookup-table scoring provably equals brute-force
    cosine — which is how the gate queries carry an exact DuckDB
    oracle.

    Gate/oracle machinery only: the per-subspace row_number is a
    single-task sort per j and the codebook is corpus-sized — at
    production scale you train a fixed-size codebook with pq_train
    (m·k·d_sub floats on the driver) and never build this frame.
    Skew note: downstream _nearest_codes(broadcast=False) joins this
    frame on ``j``, which has only m distinct values — if the planner
    picks a shuffle join, at most m tasks carry the O(n²·m) scan
    (the same few-key-skew class salted elsewhere). Acceptable at
    gate SFs; salt ``j`` before growing the gate corpus."""
    from pyspark.sql import Window

    subs = _subvectors(df, id_col, vec_col, m, d_sub)
    w = Window.partitionBy("j").orderBy(id_col)
    return subs.select(
        "j",
        (F.row_number().over(w) - 1).alias("code"),
        F.col("sub").alias("cvec"),
    )


def pq_encode_df(
    df: DataFrame,
    codebook_df: DataFrame,
    m: int,
    d_sub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_codebook: bool = False,
) -> DataFrame:
    """pq_encode against a codebook that is itself a DataFrame of
    (j, code, cvec) rows — no Python-side codebook materialization.
    Same output contract as pq_encode: (id, codes array<int> of
    length m). Default broadcast=False because the DataFrame form
    exists mainly for corpus-derived (degenerate) codebooks where a
    forced broadcast would ship SF-proportional data."""
    subs = _subvectors(df, id_col, vec_col, m, d_sub)
    return (
        _nearest_codes(subs, codebook_df, id_col, broadcast=broadcast_codebook)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("j", "code"))).alias("__p"))
        .select(id_col, F.col("__p.code").alias("codes"))
    )


def pq_topk_df(
    codes_df: DataFrame,
    codebook_df: DataFrame,
    probe: list[float],
    m: int,
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """pq_topk with the lookup tables computed IN-PLAN from a
    codebook DataFrame: per (j, code) the LUT row carries
    dot(q_j, c) and ‖c‖², the codes explode to (id, j, code) and
    equi-join the LUT, and the per-id partial sums fold in fixed j
    order (array_sort + ordered aggregate — the same summation
    grouping as the constant-array pq_topk, so the two paths are
    bit-identical and share the round-6-decimals hash discipline).
    The probe stays a constant array (it is a single query vector);
    no corpus rows reach the driver."""
    d_sub, rem = divmod(len(probe), m)
    if rem:
        raise ValueError(f"probe dim {len(probe)} not divisible by m={m}")
    qnorm = math.sqrt(sum(float(x) * float(x) for x in probe))
    probe_arr = lit_double_array(probe)
    qsub = F.slice(probe_arr, F.col("j") * d_sub + 1, F.lit(d_sub))
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, v: acc + v
    )
    lut = codebook_df.select(
        "j",
        "code",
        fold(F.zip_with(qsub, F.col("cvec"), lambda a, b: a * b)).alias("__qdot"),
        fold(F.transform(F.col("cvec"), lambda x: x * x)).alias("__nsq"),
    )
    scored = (
        codes_df.select(id_col, F.posexplode("codes").alias("j", "code"))
        .join(lut, ["j", "code"])
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("j", "__qdot", "__nsq"))
            ).alias("__t")
        )
        .select(
            id_col,
            fold(F.col("__t.__qdot")).alias("__adot"),
            fold(F.col("__t.__nsq")).alias("__ansq"),
        )
    )
    sim = F.round(
        F.col("__adot") / (F.lit(qnorm) * F.sqrt(F.col("__ansq"))), 6
    )
    return (
        scored.select(id_col, sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(topk)
    )


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    probe: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k over PQ codes via asymmetric-distance
    lookup tables: (id, sim). The per-probe tables (dot(qⱼ, c) and
    ‖c‖² per codeword) are computed here in Python — m·k floats — and
    baked into the expression as constant arrays, so scoring touches
    only the m-byte codes column; TakeOrdered plans the cut."""
    m, d_sub = _check_books(codebooks)
    if len(probe) != m * d_sub:
        raise ValueError(f"probe dim {len(probe)} != {m * d_sub}")
    qsub = [probe[j * d_sub : (j + 1) * d_sub] for j in range(m)]
    qnorm = math.sqrt(sum(float(x) * float(x) for x in probe))
    lut = [
        [sum(float(q) * float(c) for q, c in zip(qsub[j], cent)) for cent in book]
        for j, book in enumerate(codebooks)
    ]
    nsq = [
        [sum(float(c) * float(c) for c in cent) for cent in book]
        for book in codebooks
    ]

    def const(vals):
        return lit_double_array(vals)

    adot, ansq = None, None
    for j in range(m):
        e = F.element_at(const(lut[j]), F.col("codes")[j] + 1)
        n = F.element_at(const(nsq[j]), F.col("codes")[j] + 1)
        adot = e if adot is None else adot + e
        ansq = n if ansq is None else ansq + n
    sim = F.round(adot / (F.lit(qnorm) * F.sqrt(ansq)), 6)
    return (
        codes_df.select(id_col, sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(topk)
    )


def cosine_topk_ivfpq(
    df: DataFrame,
    probe_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 4,
    pq_k: int = 16,
    kmeans_iters: int = 1,
    pq_iters: int = 2,
    exclude_id=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    codebook_df: DataFrame | None = None,
) -> DataFrame:
    """IVF + PQ composed (FAISS's IVFPQ shape): IVF cells prune WHICH
    rows are considered, PQ codes + lookup tables keep the scoring in
    codegen arithmetic. Degenerate config (n_probe = n_cells +
    codebook = corpus subvectors) provably equals brute force — the
    oracle trick both constituent tiers already use.

    This SELF-CONTAINED entry point re-runs cell assignment, codebook
    training, and candidate encoding from the float vectors on every
    call — convenient for gates and one-off queries, but NOT the
    100 TB serving shape. Production follows the build-once /
    search-many economics of similarity/index.py: persist
    ``(pq_encode output, books, cell assignment)`` once per corpus
    version (partitionBy(__cell) so probes prune at the storage
    layer), then per query only rank centroids and scan the m-byte
    codes with pq_topk. Pass precomputed ``codebooks`` here to skip
    at least the training pass.

    probe_vec comes in as floats (not an id) so the same entry point
    serves external queries; pass exclude_id to drop the probe row
    itself when it lives in the corpus."""
    from shmr_spark.similarity.search import ivf_assign

    assigned, centroids = ivf_assign(
        df.select(id_col, vec_col), n_cells, id_col, vec_col, kmeans_iters
    )
    from shmr_spark.functions.vectors import cosine_similarity

    probe_arr = lit_double_array(probe_vec)
    # probe norm is a constant, so cosine ranks cells identically to
    # the probe-normalized dot; nanvl maps a degenerate zero-norm
    # centroid below every real sim (same guard as _assign_cells) so
    # it loses the probe cut instead of sorting as NULL
    cent_sim = F.nanvl(
        cosine_similarity(F.col("__cvec"), probe_arr), F.lit(-2.0)
    )
    probe_cells = (
        centroids.select("__cell", cent_sim.alias("__s"))
        .orderBy(F.desc("__s"), F.asc("__cell"))
        .limit(n_probe)
        .select("__cell")
    )
    candidates = assigned.join(F.broadcast(probe_cells), "__cell")
    if exclude_id is not None:
        candidates = candidates.filter(F.col(id_col) != exclude_id)

    if codebook_df is not None:
        # fully in-plan codebook (the gate's degenerate config):
        # encode + LUT-score against the (j, code, cvec) frame —
        # nothing corpus-sized reaches the driver
        d_sub, rem = divmod(len(probe_vec), m)
        if rem:
            raise ValueError(f"probe dim {len(probe_vec)} not divisible by m={m}")
        codes = pq_encode_df(
            candidates, codebook_df, m, d_sub, id_col=id_col, vec_col=vec_col
        )
        return pq_topk_df(
            codes,
            codebook_df,
            [float(x) for x in probe_vec],
            m,
            topk=k,
            id_col=id_col,
        )
    books = (
        codebooks
        if codebooks is not None
        else pq_train(
            df, m=m, k=pq_k, iters=pq_iters, id_col=id_col, vec_col=vec_col
        )
    )
    codes = pq_encode(candidates, books, id_col=id_col, vec_col=vec_col)
    return pq_topk(codes, books, [float(x) for x in probe_vec], topk=k, id_col=id_col)
