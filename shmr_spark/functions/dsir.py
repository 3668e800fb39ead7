"""DSIR-style importance weighting for training-data selection.

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023): estimate a target-domain distribution
p_t and a raw-pool distribution p_r over cheap bag-of-word features,
weight every raw document x by its importance log-ratio
log p_t(x) − log p_r(x), and keep a fixed budget of top-weighted
documents. The result is a raw-pool subset that looks like the
target domain without training a classifier.

Two feature spaces, selected by ``hash_buckets``:

- ``None`` (default): the raw unigram vocabulary. Correct whenever
  Heaps' law holds (vocabulary ~O(corpus^0.5)), which bounds the
  broadcast count relation for curated corpora.
- ``hash_buckets=B``: the paper's hashed-feature estimator — every
  token maps to ``bucket = md5_60bits(tok) mod B`` and the
  distributions are estimated over the ≤B buckets. This is what
  GUARANTEES a bounded feature space when a raw 100 TB web corpus's
  vocabulary (typos, URLs, code fragments) outgrows the Heaps-law
  assumption: the count relation is ≤B rows at ANY corpus size, by
  construction rather than by corpus statistics. The hash is the
  engine-portable md5-prefix idiom (first 15 hex chars → 60-bit
  non-negative int; identical in Spark and DuckDB, the
  train_test_split / ngram_decontamination playbook) so the hashed
  gate is oracle-checkable, unlike xxhash64 which only Spark has.

Both distributions are add-one smoothed over the SHARED raw-pool
vocabulary V (every token seen anywhere appears in both supports, so
the ratio is always finite):

    p_t(w) = (c_t(w) + 1) / (N_t + V)
    p_r(w) = (c_r(w) + 1) / (N_r + V)

    logweight(x) = Σ_w c_x(w) · [ln p_t(w) − ln p_r(w)]

Scale design (100 TB):
- one explode + one (doc, token) partial-aggregated groupBy — shuffle
  bytes bounded by distinct (doc, token) pairs, not token instances;
- the per-token count relation (c_r, c_t together — ONE aggregation
  computes both via a conditional sum) is Zipf-bounded (Heaps' law:
  vocabulary ~O(corpus^0.5)) → broadcast-eligible far beyond the
  corpus itself; totals (N_t, N_r, V) ride the same relation as an
  in-plan 1-row scalar (functions/scalars.py), zero driver actions;
- selection is a fixed budget k → TakeOrdered (per-partition top-k +
  driver merge of k·P rows), NO global sort. A fractional budget
  would need a global rank — that variant exists as
  operators/ranking.global_rank and is deliberately not the default.

Cross-engine determinism (oracle contract): every ln() operand is a
ratio of exact integers cast to double — identical bits in any
engine; the per-(doc, token) term is floor-quantized ONCE
(floor(term·10⁶ + 0.5) → int64, functions/numeric.py discipline),
weighted by the exact integer count and summed in int64, so the
per-document total is order-free. ln()'s ≤1-ulp libm drift matters
only within ~|term|·10⁶·2⁻⁵² of a floor boundary; the gate corpora's
measured margins are pinned in tests (the lm_perplexity playbook).
Unlike the LM tier's −ln P ≥ 0 terms, DSIR terms are SIGNED (a token
more common in the raw pool than the target has a negative term) —
the +0.5 floor rule rounds half-up for negatives too and both
engines compute the identical expression, so signedness costs
nothing; the boundary-margin test covers both signs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shmr_spark.functions.numeric import _SCALE, _scaled_long
from shmr_spark.functions.scalars import with_scalars
from shmr_spark.functions.text import tokens


def _hashed_bucket(col: Column, num_buckets: int) -> Column:
    """Engine-portable feature hash: first 60 bits of md5 mod B —
    non-negative, so Spark's pmod and SQL's ``%`` agree."""
    h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(num_buckets))


def dsir_logweight_terms(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_buckets: int | None = None,
    ngrams: int = 1,
) -> DataFrame:
    """The per-(document, distinct-feature) term table behind
    ``dsir_logweights``: (id_col, tok, cnt, n_toks, term) where
    ``term`` is the un-quantized ln p_t(tok) − ln p_r(tok) and
    ``n_toks`` is the document's TOKEN count (feature-space-
    invariant — it rides the group key so per-token normalization
    survives feature sets larger than the token sequence). Exposed
    so tests can measure the term population's distance from
    floor-quantization boundaries (the cross-engine ln() exposure).

    ``is_target`` is a boolean Column over ``docs``'s columns naming
    the target domain (e.g. ``F.col("lang") == "en"``); target
    documents are part of the raw pool, as in the paper's
    continued-pretraining setting.

    With ``hash_buckets=B`` the feature (and the output's ``tok``
    column, then a BIGINT bucket id) is ``md5_60bits(feature) mod
    B`` — the paper's hashed estimator; see the module docstring.
    ``ngrams=2`` widens the feature set to unigrams + adjacent
    bigrams (the paper's actual feature space; bigrams reuse
    functions/lm.py's O(tokens) zip_with construction). The
    downstream pipeline is identical in every mode: only the feature
    key changes, so everything (one explode, distinct-(doc, feature)
    exchange, broadcast count relation, in-plan totals) is shared.
    """
    if ngrams not in (1, 2):
        raise ValueError(f"ngrams must be 1 or 2, got {ngrams}")
    toks_arr = tokens(text_col)
    if ngrams == 2:
        from shmr_spark.functions.lm import _bigram_strings

        feats_arr = F.concat(toks_arr, _bigram_strings(text_col))
    else:
        feats_arr = toks_arr
    feat = (
        F.col("tok")
        if hash_buckets is None
        else _hashed_bucket(F.col("tok"), hash_buckets)
    )
    tok_tbl = docs.select(
        F.col(id_col),
        is_target.alias("__is_t"),
        F.size(toks_arr).cast("long").alias("n_toks"),
        F.explode(feats_arr).alias("tok"),
    ).select(
        F.col(id_col), F.col("__is_t"), F.col("n_toks"), feat.alias("tok")
    )
    # per-doc counts first: the feature-count join input shrinks from
    # feature instances to distinct-per-document features (__is_t and
    # n_toks are functionally dependent on the document, so they ride
    # the key)
    dc = tok_tbl.groupBy(id_col, "__is_t", "n_toks", "tok").agg(
        F.count("*").alias("cnt")
    )
    # raw + target counts from ONE aggregation over dc
    cc = dc.groupBy("tok").agg(
        F.sum("cnt").alias("cr"),
        F.sum(F.when(F.col("__is_t"), F.col("cnt")).otherwise(0)).alias(
            "ct"
        ),
    )
    totals = cc.agg(
        F.count("*").alias("__v"),
        F.sum("cr").alias("__nr"),
        F.sum("ct").alias("__nt"),
    )
    scored = with_scalars(dc.join(F.broadcast(cc), "tok"), totals)
    term = F.log(
        (F.col("ct") + 1).cast("double")
        / (F.col("__nt") + F.col("__v")).cast("double")
    ) - F.log(
        (F.col("cr") + 1).cast("double")
        / (F.col("__nr") + F.col("__v")).cast("double")
    )
    return scored.select(id_col, "tok", "cnt", "n_toks", term.alias("term"))


def dsir_logweights(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_buckets: int | None = None,
    ngrams: int = 1,
) -> DataFrame:
    """Per-document DSIR importance log-weight:
    (id_col, n_tokens BIGINT, logweight DOUBLE). Every document of
    ``docs`` appears exactly once (``tokens`` of an empty string is
    [''], one token, so no document drops out). ``n_tokens`` counts
    TOKENS in every mode — bucket collisions merge features and
    ``ngrams=2`` adds bigram features, but the count rides the group
    key from the scan, so per-token normalization (the training
    pipeline's mean) is feature-space-invariant."""
    scored = dsir_logweight_terms(
        docs, is_target, id_col, text_col, hash_buckets, ngrams
    )
    t6 = _scaled_long(F.col("term"))
    return scored.groupBy(id_col).agg(
        F.max("n_toks").alias("n_tokens"),
        (F.sum(t6 * F.col("cnt")).cast("double") / F.lit(_SCALE)).alias(
            "logweight"
        ),
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_buckets: int | None = None,
    ngrams: int = 1,
) -> DataFrame:
    """Top-k raw-pool documents by DSIR importance weight — the
    paper's selection step with a deterministic rank in place of
    Gumbel-noise resampling (reproducible under reruns; ties broken
    by id). Fixed k keeps the plan at TakeOrdered — no global sort."""
    w = dsir_logweights(
        docs, is_target, id_col, text_col, hash_buckets, ngrams
    )
    return w.orderBy(F.desc("logweight"), F.asc(id_col)).limit(k)
