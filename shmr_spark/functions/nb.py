"""In-plan multinomial Naive Bayes — train AND score as one lazy
Spark plan, zero driver-side model state.

The fastText-style supervised filter (Joulin et al. 2017, "Bag of
Tricks for Efficient Text Classification"; the FineWeb-Edu / CCNet
quality-classifier playbook) reduced to its count-based core: a
multinomial NB over bag-of-token features is the closed-form member
of that family — training is ONE aggregation over the labeled split
(per-(token, class) counts), so the whole train→score pipeline stays
declarative, distributed, and oracle-checkable, where a gradient-
trained classifier would need iterative driver loops and float
accumulation order the cross-engine hash could never pin.

Model (add-one smoothing over the train vocabulary V, all counts
exact integers):

    score(s | x) = ln(d_s / D) + Σ_w c_x(w) · ln((c(w,s) + 1) / (N_s + |V|))
    pred(x)      = argmax_s score(s | x)    (ties → smallest class)

Scale design (100 TB):
- one explode per split; the train side collapses to the
  per-(token, class) count relation — |V|·S rows, Zipf-bounded and
  broadcast-eligible (S = #classes, single digits to hundreds); with
  ``hash_buckets=B`` the relation is ≤ B·S rows at ANY corpus size
  (the DSIR hashed-feature guarantee, same md5-prefix bucket);
- class totals (N_s, d_s) ride a second S-row broadcast; |V| and D
  ride in-plan as 1-row scalars (functions/scalars.py) — zero driver
  actions at plan time;
- scoring is distinct-(doc, token) pairs × S through a broadcast
  join — linear in corpus tokens for fixed S, no shuffle beyond the
  per-doc count aggregation;
- argmax is an ordinary partial-aggregable min over an
  (−score, class) struct — no per-doc window, no global sort.

Cross-engine determinism (oracle contract): every ln() operand is a
ratio of exact integers cast to double; each distinct (token, class)
likelihood and each class prior is floor-quantized ONCE
(floor(x·10⁶ + 0.5) → int64, functions/numeric.py discipline) and the
per-document score is an int64 dot product — order-free, so argmax
compares EXACT integers and both engines agree bit-for-bit. ln()'s
≤1-ulp libm drift matters only within ~|x|·10⁶·2⁻⁵² of a floor
boundary; gate-corpus margins are pinned in tests (the lm/dsir
playbook).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shmr_spark.functions.dsir import _hashed_bucket
from shmr_spark.functions.numeric import _SCALE, _scaled_long
from shmr_spark.functions.scalars import with_scalars
from shmr_spark.functions.text import tokens


def nb_score_terms(
    docs: DataFrame,
    class_col: str,
    is_train: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_buckets: int | None = None,
) -> DataFrame:
    """The per-(held-out document, class, distinct-feature) term
    table behind ``nb_class_scores``: (id_col, class_col, tok, cnt,
    lik, prior) where ``lik`` and ``prior`` are the UN-quantized
    ln() terms. Exposed so tests can measure both term populations'
    distance from floor-quantization boundaries (the cross-engine
    ln() exposure — the lm/dsir playbook). ``is_train`` is a boolean
    Column over ``docs``'s columns naming the labeled training split;
    every other document is scored. Tokens never seen in training
    stay in the table with c = 0 (they still separate classes
    through the class-total denominators)."""
    feat = (
        F.col("tok")
        if hash_buckets is None
        else _hashed_bucket(F.col("tok"), hash_buckets)
    )
    toks = docs.select(
        F.col(id_col),
        F.col(class_col),
        is_train.alias("__is_tr"),
        F.explode(tokens(text_col)).alias("tok"),
    ).select(id_col, class_col, "__is_tr", feat.alias("tok"))

    train = toks.filter(F.col("__is_tr"))
    # the model: per-(token, class) counts + per-class token totals
    cc = train.groupBy("tok", class_col).agg(F.count("*").alias("__cws"))
    cls = cc.groupBy(class_col).agg(F.sum("__cws").alias("__ns"))
    # class doc priors from the train split's documents
    pri = (
        docs.filter(is_train)
        .groupBy(class_col)
        .agg(F.count("*").alias("__ds"))
    )
    classes = cls.join(pri, class_col)
    totals = cc.groupBy().agg(
        F.count_distinct("tok").alias("__v"),
    ).crossJoin(pri.groupBy().agg(F.sum("__ds").alias("__d")))

    # held-out per-(doc, token) counts; the class label column is the
    # TRUE label and must not leak into scoring — drop it here
    dc = (
        toks.filter(~F.col("__is_tr"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("cnt"))
    )
    scored = (
        with_scalars(dc.crossJoin(F.broadcast(classes)), totals)
        .join(F.broadcast(cc), ["tok", class_col], "left")
        .withColumn("__cws", F.coalesce(F.col("__cws"), F.lit(0)))
    )
    lik = F.log(
        (F.col("__cws") + 1).cast("double")
        / (F.col("__ns") + F.col("__v")).cast("double")
    )
    prior = F.log(F.col("__ds").cast("double") / F.col("__d").cast("double"))
    return scored.select(
        id_col,
        class_col,
        "tok",
        "cnt",
        lik.alias("lik"),
        prior.alias("prior"),
    )


def nb_class_scores(
    docs: DataFrame,
    class_col: str,
    is_train: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_buckets: int | None = None,
) -> DataFrame:
    """Per-(held-out document, class) NB score table:
    (id_col, class_col, score_q BIGINT) — ``score_q`` is the
    10⁶-scaled int64 score, exposed un-divided so tests can assert
    the argmax compares exact integers."""
    terms = nb_score_terms(
        docs, class_col, is_train, id_col, text_col, hash_buckets
    )
    return terms.groupBy(id_col, class_col).agg(
        (
            F.min(_scaled_long(F.col("prior")))
            + F.sum(_scaled_long(F.col("lik")) * F.col("cnt"))
        ).alias("score_q")
    )


def nb_classify(
    docs: DataFrame,
    class_col: str,
    is_train: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_buckets: int | None = None,
) -> DataFrame:
    """Argmax prediction for every held-out document:
    (id_col, pred STRING, score DOUBLE) — ``score`` is the winning
    class's 10⁶-quantized log-score divided back to double. Ties
    break to the smallest class name (min over a (−score_q, class)
    struct: the negation flips the int64 order so one partial-
    aggregable MIN yields highest-score-then-smallest-class)."""
    scores = nb_class_scores(
        docs, class_col, is_train, id_col, text_col, hash_buckets
    )
    best = scores.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("score_q")).alias("__neg"),
                F.col(class_col).alias("__cls"),
            )
        ).alias("__best")
    )
    return best.select(
        id_col,
        F.col("__best.__cls").alias("pred"),
        (
            (-F.col("__best.__neg")).cast("double") / F.lit(_SCALE)
        ).alias("score"),
    )


def nb_margin_select(
    docs: DataFrame,
    is_target: Column,
    is_train: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_buckets: int | None = None,
) -> DataFrame:
    """Classifier-based data selection — the FineWeb-Edu/Llama filter
    step: train target-vs-rest on the labeled split, score every
    held-out document, keep the top-k by classifier margin
    score(target) − score(rest). Output: (id_col, margin DOUBLE),
    ordered (margin desc, id asc). Both classes must appear in the
    training split (otherwise the margin degenerates to the single
    trained class's score).

    The margin is a difference of two 10⁶-quantized int64 scores —
    exact integer arithmetic end to end, so the cut is
    engine-reproducible (the generative cousin, DSIR's importance
    log-ratio, lives in functions/dsir.py; this is the
    discriminative member: per-class conditionals + priors instead
    of target-vs-pool marginals). Fixed k keeps the plan at
    TakeOrdered — no global sort."""
    labeled = docs.withColumn(
        "__cls", F.when(is_target, F.lit("target")).otherwise(F.lit("rest"))
    )
    scores = nb_class_scores(
        labeled, "__cls", is_train, id_col, text_col, hash_buckets
    )
    margin_q = F.sum(
        F.when(F.col("__cls") == "target", F.col("score_q")).otherwise(
            -F.col("score_q")
        )
    )
    per_doc = scores.groupBy(id_col).agg(
        F.count("*").alias("__n_cls"),
        (margin_q.cast("double") / F.lit(_SCALE)).alias("margin"),
    )
    return (
        per_doc.drop("__n_cls")
        .orderBy(F.desc("margin"), F.asc(id_col))
        .limit(k)
    )
