"""Corpus-level statistical text quality: bigram language-model
scoring and repetition metrics.

Two standard LLM-training-data quality filters the heuristic tier
(functions/text.py quality_score) cannot express, because both need
CORPUS-level statistics, not per-row expressions:

- ``bigram_lm_scores``: the CCNet/KenLM-style filter — train an
  add-one-smoothed bigram LM on the corpus itself, score every
  document by its average negative log-probability (perplexity =
  exp(score), a monotone transform, so thresholding the score IS
  thresholding perplexity). High score = the document's token
  transitions are unlike the corpus = noise/outlier candidate.
  (queries/text.py's unigram_logprob_score is the order-0 member of
  this family; conditioning on the previous token is what separates
  fluent text from bag-of-frequent-words gibberish.)
- ``repetition_metrics``: the Gopher-repetition family — duplicate
  token fraction, most-frequent-token share, most-frequent-bigram
  share. High values flag degenerate/boilerplate documents.

Both are pure DataFrame compositions (explode → partial-aggregated
groupBy → join), zero Python UDFs.

Scale design (100 TB):
- per-token work is explode + hash aggregation — map-side partial
  aggregation collapses each document's repeats before the exchange,
  so shuffle bytes are bounded by DISTINCT (doc, gram) pairs, not
  token instances;
- the unigram/vocab relation is Zipf-bounded (vocabulary grows
  ~O(corpus^0.5), Heaps' law) → broadcast-eligible long after the
  corpus itself stops being; the bigram-count join shuffles on
  (w1, w2) and is linear in distinct bigrams; head-bigram skew is
  AQE skew-join territory, and the per-document final aggregate is
  bounded by document length;
- all scoring state per document is O(distinct bigrams in the doc) —
  no global window, no driver collect.

Cross-engine determinism (the oracle contract): each bigram's
negative log-probability is quantized ONCE via the floor rule
(floor(x·10⁶ + 0.5) → int64, functions/numeric.py), then weighted by
its exact integer count and summed in int64 — order-free. The only
transcendental is ln(), whose ≤1-ulp cross-engine drift matters only
within ~|x|·10⁶·2⁻⁵² ≈ 3e-9 of a floor boundary; the gate corpora's
measured margins are pinned in tests/test_edge_cases.py
(test_lm_terms_clear_floor_boundaries), the same playbook as the
similarity tier's round(,6) policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shmr_spark.functions.numeric import _SCALE, _scaled_long
from shmr_spark.functions.scalars import with_scalars
from shmr_spark.functions.text import tokens


def _bigram_structs(text_col: str) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs — the zip_with
    form is O(tokens) (see dedup/minhash.py shingle_ngrams for why
    the transform(sequence)+index form is quadratic). zip_with pads
    the shorter side with nulls; slicing to size-1 drops the stub.
    This file's ONE copy of the tail-stub arithmetic — the string
    form below derives from it."""
    toks = tokens(text_col)
    pairs = F.zip_with(
        toks,
        F.slice(toks, 2, 2_000_000_000),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return F.slice(pairs, 1, F.greatest(F.size(toks) - 1, F.lit(0)))


def _bigram_strings(text_col: str) -> Column:
    """array<string> of adjacent bigrams ('w1 w2'), via the struct
    form so the pair construction exists exactly once."""
    return F.transform(
        _bigram_structs(text_col),
        lambda p: F.concat(p["w1"], F.lit(" "), p["w2"]),
    )


def bigram_lm_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The per-(document, distinct-bigram) scoring table behind
    ``bigram_lm_scores``: (id_col, w1, w2, cnt, term) where ``term``
    is the un-quantized −ln P(w2|w1). Exposed so tests can measure
    the term population's distance from floor-quantization
    boundaries (the cross-engine ln() exposure)."""
    tok_tbl = docs.select(F.explode(tokens(text_col)).alias("tok"))
    uni = tok_tbl.groupBy("tok").agg(F.count("*").alias("c1"))
    vocab = uni.agg(F.count("*").alias("v"))

    bg = docs.select(
        F.col(id_col), F.explode(_bigram_structs(text_col)).alias("p")
    ).select(id_col, "p.w1", "p.w2")
    # per-doc counts first: the (w1,w2)-join input shrinks from token
    # instances to distinct-per-document bigrams
    bc = bg.groupBy(id_col, "w1", "w2").agg(F.count("*").alias("cnt"))
    c2 = bc.groupBy("w1", "w2").agg(F.sum("cnt").alias("c2"))

    scored = with_scalars(
        bc.join(c2, ["w1", "w2"]).join(uni.withColumnRenamed("tok", "w1"), "w1"),
        vocab,
    )
    term = -F.log(
        (F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v")).cast("double")
    )
    return scored.select(id_col, "w1", "w2", "cnt", term.alias("term"))


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document average negative log-probability under an
    add-one-smoothed bigram LM trained on ``docs`` itself.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), V = |vocabulary|.
    Returns (id_col, n_bigrams, avg_neg_logp); documents with fewer
    than two tokens have no bigrams and are absent (the SQL twin
    behaves identically — generate_series(1, 0) is empty).

    avg_neg_logp ≥ 0 always (c(w1,w2)+1 ≤ c(w1)+V because every
    bigram instance is also a w1 instance), so the floor-quantizer's
    negative-ties caveat (functions/numeric.py dquant) never applies.
    """
    scored = bigram_lm_terms(docs, id_col, text_col)
    t6 = _scaled_long(F.col("term"))
    return scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        (
            (F.sum(t6 * F.col("cnt")).cast("double") / F.lit(_SCALE))
            / F.sum("cnt").cast("double")
        ).alias("avg_neg_logp"),
    )


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style per-document repetition statistics:

    - dup_token_frac: 1 − distinct/total tokens (how much of the doc
      is repeats);
    - top_token_frac: share of the single most frequent token;
    - top_bigram_frac: share of the most frequent adjacent bigram
      (0.0 for single-token documents, which have none).

    All three are exact-integer ratios — int/int IEEE division is
    correctly rounded in both engines, so no quantization is needed.
    Every row of ``docs`` appears exactly once in the output.
    """
    tok_tbl = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tc = tok_tbl.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    ts = tc.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_tok"),
    )

    bg_tbl = docs.select(
        F.col(id_col), F.explode(_bigram_strings(text_col)).alias("bg")
    )
    bc = bg_tbl.groupBy(id_col, "bg").agg(F.count("*").alias("c"))
    bs = bc.groupBy(id_col).agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bg")
    )

    return ts.join(bs, id_col, "left").select(
        id_col,
        F.col("n_tokens"),
        (
            (F.col("n_tokens") - F.col("n_distinct")).cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("dup_token_frac"),
        (F.col("top_tok").cast("double") / F.col("n_tokens").cast("double")).alias(
            "top_token_frac"
        ),
        F.coalesce(
            F.col("top_bg").cast("double") / F.col("n_bigrams").cast("double"),
            F.lit(0.0),
        ).alias("top_bigram_frac"),
    )


def source_unigram_kl_terms(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-(group, token) KL-divergence contribution terms for
    ``source_unigram_kl`` — KL(P_group ‖ P_corpus) over whitespace
    unigrams, the standard corpus-mixing diagnostic (how far each
    source's token distribution sits from the blend it feeds).

    Returns one row per distinct (group, token) with:
    - ``c``    — token count within the group (int64),
    - ``n``    — group token total (int64),
    - ``term`` — ln((c·N) / (n·ct)) as double (N = corpus total,
      ct = corpus-wide token count): the log likelihood ratio whose
      p_group-weighted sum is the group's KL divergence,
    - ``q``    — ``term`` floor-quantized once to int64 (the
      functions/numeric discipline), so downstream sums are exact and
      order-free on both engines.

    No smoothing is needed: every (group, token) term has ct ≥ c ≥ 1
    by construction, so the ratio is finite and positive.

    Scale (100 TB): ONE documents scan. The explode collapses through
    map-side partial aggregation — the first exchange is bounded by
    DISTINCT (group, token) pairs, not token instances. The corpus
    total per token is then folded INTO the relation by a second
    token-keyed aggregation that carries each token's per-group
    counts as a ≤|groups|-struct list (groups are a fixed catalog
    constant), so there is NO token-keyed join and no re-scan: the
    group-totals and corpus-total branches hang off the same exchange
    and execute as ReusedExchange (plan-pinned in tests/test_plans.py
    — the naive stc⋈tc formulation re-ran the explode scan). The
    group totals relation is |groups| rows and broadcasts; the corpus
    total is a 1-row scalar cross join. Group counts c·N and n·ct
    stay in int64→double casts that are correctly rounded in both
    engines (functions/numeric.py, verified to 2⁶²).
    """
    e = docs.select(F.col(group_col).alias("grp"), F.explode(tokens("text")).alias("tok"))
    stc = e.groupBy("grp", "tok").agg(F.count("*").alias("c"))
    g = stc.groupBy("tok").agg(
        F.sum("c").alias("ct"),
        F.collect_list(F.struct("grp", "c")).alias("__per"),
    )
    gx = g.select("tok", "ct", F.explode("__per").alias("__p")).select(
        "tok", "ct", F.col("__p.grp").alias("grp"), F.col("__p.c").alias("c")
    )
    ns = gx.groupBy("grp").agg(F.sum("c").alias("n"))
    tot = gx.agg(F.sum("c").alias("__nn"))
    term = with_scalars(gx.join(F.broadcast(ns), "grp"), tot)
    ratio = (F.col("c").cast("double") * F.col("__nn").cast("double")) / (
        F.col("n").cast("double") * F.col("ct").cast("double")
    )
    return (
        term.withColumn("term", F.log(ratio))
        .withColumn("q", _scaled_long(F.col("term")))
        .drop("__nn", "ct")
    )


def source_unigram_kl(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-group unigram KL divergence vs the whole corpus, plus the
    group's token total and vocabulary size. Output is |groups| rows;
    the KL is Σ (c/n)·term ≈ Σ c·q / (n·10⁶) — an exact weighted sum
    divided once, identical on both engines. The weighted sum runs in
    DECIMAL(38,0), not int64: |q| reaches ~ln(N)·10⁶ ≈ 3×10⁷ at a
    10¹³-token corpus, so a single c·q product can pass 2⁶³ for a
    source past ~3×10¹¹ tokens — int64 would wrap silently in Spark
    while DuckDB promotes to HUGEINT, breaking parity exactly at the
    scale the operator targets. Decimal headroom is ~10³⁸ vs a
    worst-case Σ|c·q| ≲ 10²¹ per group; the final decimal→double cast
    is correctly rounded in both engines at scale 0
    (functions/numeric.py)."""
    t = source_unigram_kl_terms(docs, group_col)
    agg = t.groupBy("grp").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab_size"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("q")).alias("__sq"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "vocab_size",
        (
            F.col("__sq").cast("double")
            / 1000000.0
            / F.col("n_tokens").cast("double")
        ).alias("kl_vs_corpus"),
    )
