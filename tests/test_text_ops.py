"""TF-IDF cross-check vs pure-Python ground truth + CSV malformed-row
handling modes."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from shmr_spark.catalog import load_table
from shmr_spark.functions.tfidf import tfidf


def test_tfidf_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30).select("doc_id", "text")
    rows = {r.doc_id: r.text for r in docs.collect()}
    n = len(rows)
    dfreq = Counter()
    tfs = {}
    for d, text in rows.items():
        c = Counter(text.split(" "))
        tfs[d] = c
        for t in c:
            dfreq[t] += 1
    got = tfidf(docs).collect()
    assert len(got) == sum(len(c) for c in tfs.values())
    for r in got:
        want = tfs[r.doc_id][r.term] * (math.log((n + 1) / (dfreq[r.term] + 1)) + 1.0)
        assert abs(r.tfidf - want) < 1e-9
        assert r.tf == tfs[r.doc_id][r.term]
        assert r.df == dfreq[r.term]


def test_tfidf_top_k_per_doc(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = tfidf(docs, top_k=3)
    per = out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= 3 for r in per)


def test_csv_malformed_modes(spark, tmp_path):
    p = tmp_path / "bad.csv"
    # note: a short row (missing trailing fields) is NOT malformed to
    # Spark — it null-fills; malformed means an unparseable value
    p.write_text("a,1\nb,2\nbad,notanint\nc,3\n")
    schema = "name string, x int"
    permissive = spark.read.schema(schema).csv(str(p), mode="PERMISSIVE")
    assert permissive.count() == 4  # bad row kept with null column
    assert permissive.filter(F.col("x").isNull()).count() == 1
    dropped = spark.read.schema(schema).csv(str(p), mode="DROPMALFORMED")
    # quirk: bare count() skips parsing (zero columns required) so
    # malformed rows are not detected — materialize columns instead
    rows = dropped.collect()
    assert len(rows) == 3
    assert all(r.name != "bad" for r in rows)


def test_bm25_matches_python(spark, sf_dir):
    from shmr_spark.functions.bm25 import bm25

    docs = load_table(spark, sf_dir, "documents").limit(25).select("doc_id", "text")
    rows = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    n = len(rows)
    avgdl = sum(len(t) for t in rows.values()) / n
    dfreq = Counter()
    for toks in rows.values():
        for t in set(toks):
            dfreq[t] += 1
    k1, b = 1.2, 0.75
    got = bm25(docs).collect()
    for r in got:
        toks = rows[r.doc_id]
        tf = toks.count(r.term)
        idf = math.log(1 + (n - dfreq[r.term] + 0.5) / (dfreq[r.term] + 0.5))
        want = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        assert abs(r.bm25 - want) < 1e-9


def test_glob_multifile_parquet_read(spark, sf_dir, tmp_path):
    """Glob inputs over a multi-file dataset — the reference's
    ListPartition model on the parquet path."""
    src = load_table(spark, sf_dir, "customer")
    base = tmp_path / "multi"
    for i in range(4):
        src.filter(F.col("c_custkey") % 4 == i).write.mode("overwrite").parquet(
            str(base / f"part={i}")
        )
    back = spark.read.parquet(str(base / "part=*"))
    assert back.count() == src.count()


def test_unigram_logprob_matches_python(spark, sf_dir):
    """Spark's unigram score ≡ a pure-Python computation to 1e-6
    (pre-round), on a sample of documents."""
    import math
    from collections import Counter

    from shmr_spark.catalog import load_table
    from shmr_spark.queries import load_all

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    vocab = Counter()
    for t in docs.values():
        vocab.update(t.split(" "))
    total = sum(vocab.values())

    got = {
        r.doc_id: r.mean_logprob
        for r in load_all()["unigram_logprob_score"].fn(spark, sf_dir).collect()
    }
    for doc_id in list(docs)[:25]:
        toks = docs[doc_id].split(" ")
        want = sum(math.log(vocab[t] / total) for t in toks) / len(toks)
        assert abs(got[doc_id] - want) < 2e-6


def test_bpe_train_matches_reference_merges(spark):
    """Sennrich toy corpus: merge sequence must equal the
    hand-computed reference run, including both count ties broken
    lexicographically ((e,s) over (s,t) at 9; (l,o) over (o,w) at 7)."""
    from shmr_spark.functions.bpe import train_bpe

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assert train_bpe(docs, num_merges=6) == [
        ("e", "s"),
        ("es", "t"),
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
        ("ew", "est"),
    ]


def test_bpe_merge_fold_non_overlapping(spark):
    """Left-to-right non-overlapping rule: 'aaaa' under merge (a,a)
    becomes [aa, aa]; 'aaa' becomes [aa, a]."""
    from pyspark.sql import functions as F

    from shmr_spark.functions.bpe import _char_split, _merge_fold

    df = spark.createDataFrame([("aaaa",), ("aaa",)], "word string").select(
        "word", _char_split(F.col("word")).alias("syms")
    )
    got = {r.word: r.m for r in df.select("word", _merge_fold("a", "a").alias("m")).collect()}
    assert got == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_bpe_encode_roundtrip_and_counts(spark):
    """Encoding concatenates back to the original words, and the
    token count equals the trained segmentation's symbol count."""
    from shmr_spark.functions.bpe import encode_bpe, train_bpe

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = train_bpe(docs, num_merges=6)
    r = encode_bpe(docs, merges).collect()[0]
    # low=1 tok ×5, lower=3 ×2, newest=2 ×6 (n+ewest), widest=4 ×3
    assert r.n_tokens == 5 * 1 + 2 * 3 + 6 * 2 + 3 * 4
    assert "".join(r.tokens) == text.replace(" ", "")


def test_bigram_lm_matches_python(spark, sf_dir):
    """bigram_lm_scores ≡ a pure-Python add-one bigram LM with the
    same floor-quantized exact summation, trained on the same subset
    (deterministic doc_id filter, not limit()). Tolerance 2e-6: each
    per-bigram term is quantized to 1e-6 once, and math.log vs the
    JVM's ln may flip a boundary case by one quantum."""
    from shmr_spark.functions.lm import bigram_lm_scores

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    rows = {r.doc_id: r.text for r in docs.collect()}
    uni = Counter()
    big = Counter()
    for t in rows.values():
        toks = t.split(" ")
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    vocab_size = len(uni)

    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logp)
        for r in bigram_lm_scores(docs).collect()
    }
    for doc_id, text in rows.items():
        toks = text.split(" ")
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            assert doc_id not in got  # single-token docs are absent
            continue
        s = 0
        for w1, w2 in bgs:
            term = -math.log((big[(w1, w2)] + 1) / (uni[w1] + vocab_size))
            s += math.floor(term * 1e6 + 0.5)
        n_bigrams, avg = got[doc_id]
        assert n_bigrams == len(bgs)
        assert abs(avg - (s / 1e6) / len(bgs)) < 2e-6


def test_bigram_lm_hand_corpus_exact(spark):
    """Hand-computable corpus: uni a=3 b=2 c=1 (V=3), bigrams
    (a,b)=2 (a,c)=1 → doc 1/2 score ln2, doc 3 score ln3, both
    floor-quantized to 6 decimals."""
    from shmr_spark.functions.lm import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    got = {r.doc_id: r.avg_neg_logp for r in bigram_lm_scores(docs).collect()}
    assert got[1] == got[2] == math.floor(math.log(2) * 1e6 + 0.5) / 1e6
    assert got[3] == math.floor(math.log(3) * 1e6 + 0.5) / 1e6


def test_repetition_metrics_hand_corpus(spark):
    """Every metric on crafted docs, including the single-token
    (no-bigram) and fully-repetitive edges."""
    from shmr_spark.functions.lm import repetition_metrics

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),  # all repeats, one bigram "a a" x3
            (2, "a b c d"),  # all distinct
            (3, "x"),  # single token: no bigrams
            (4, "a b a b a b"),  # alternating: "a b" x3, "b a" x2
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert len(got) == 4
    r1, r2, r3, r4 = got[1], got[2], got[3], got[4]
    assert (r1.n_tokens, r1.dup_token_frac, r1.top_token_frac) == (4, 0.75, 1.0)
    assert r1.top_bigram_frac == 1.0
    assert (r2.dup_token_frac, r2.top_token_frac, r2.top_bigram_frac) == (
        0.0,
        0.25,
        1.0 / 3.0,
    )
    assert (r3.n_tokens, r3.top_token_frac, r3.top_bigram_frac) == (1, 1.0, 0.0)
    assert (r4.dup_token_frac, r4.top_token_frac, r4.top_bigram_frac) == (
        4.0 / 6.0,
        0.5,
        3.0 / 5.0,
    )


def test_repetition_metrics_matches_python(spark, sf_dir):
    """Exact cross-check vs a pure-Python computation on real corpus
    documents — int/int IEEE division matches bit-for-bit."""
    from shmr_spark.functions.lm import repetition_metrics

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    rows = {r.doc_id: r.text for r in docs.collect()}
    got = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert set(got) == set(rows)
    for doc_id, text in rows.items():
        toks = text.split(" ")
        tc = Counter(toks)
        bc = Counter(zip(toks, toks[1:]))
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        assert r.dup_token_frac == (len(toks) - len(tc)) / len(toks)
        assert r.top_token_frac == max(tc.values()) / len(toks)
        want_bg = max(bc.values()) / sum(bc.values()) if bc else 0.0
        assert r.top_bigram_frac == want_bg


def test_dsir_matches_python(spark, sf_dir):
    """dsir_logweights ≡ a pure-Python DSIR estimator with the same
    floor-quantized exact summation on the same subset. Tolerance
    2e-6 per the bigram-LM rationale (one 1e-6 quantum per term,
    math.log vs JVM ln boundary flips)."""
    from shmr_spark.functions.dsir import dsir_logweights

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "lang", "text")
    )
    rows = {r.doc_id: (r.lang, r.text) for r in docs.collect()}
    cr = Counter()
    ct = Counter()
    for lang, text in rows.values():
        toks = text.split(" ")
        cr.update(toks)
        if lang == "en":
            ct.update(toks)
    v, nr, nt = len(cr), sum(cr.values()), sum(ct.values())

    got = {
        r.doc_id: (r.n_tokens, r.logweight)
        for r in dsir_logweights(docs, F.col("lang") == "en").collect()
    }
    assert set(got) == set(rows)
    for doc_id, (lang, text) in rows.items():
        toks = text.split(" ")
        s = 0
        for tok, cnt in Counter(toks).items():
            term = math.log((ct[tok] + 1) / (nt + v)) - math.log(
                (cr[tok] + 1) / (nr + v)
            )
            s += math.floor(term * 1e6 + 0.5) * cnt
        n_tokens, logweight = got[doc_id]
        assert n_tokens == len(toks)
        assert abs(logweight - s / 1e6) < 2e-6


def test_dsir_select_prefers_target_like_docs(spark):
    """Semantic check on a hand corpus: a raw-pool document written
    in the target domain's vocabulary outranks one written in
    off-domain vocabulary, and the selection returns exactly k rows
    ordered by (logweight desc, doc_id)."""
    from shmr_spark.functions.dsir import dsir_logweights, dsir_select

    docs = spark.createDataFrame(
        [
            (1, "en", "alpha beta alpha gamma"),
            (2, "en", "alpha beta delta"),
            (3, "fr", "alpha beta gamma"),  # target-like raw doc
            (4, "fr", "zut flute bof"),  # off-domain raw doc
        ],
        "doc_id long, lang string, text string",
    )
    w = {
        r.doc_id: r.logweight
        for r in dsir_logweights(docs, F.col("lang") == "en").collect()
    }
    assert w[3] > w[4], "target-vocabulary doc must outweigh off-domain doc"
    sel = dsir_select(docs, F.col("lang") == "en", k=3).collect()
    assert len(sel) == 3
    ranked = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [r.doc_id for r in sel] == [d for d, _ in ranked]
    assert 4 not in {r.doc_id for r in sel}


def test_ngram_decontamination_planted_overlap(spark, monkeypatch, tmp_path):
    """A test-split doc that embeds a train doc's 13-gram run is
    flagged with the exact shared-gram count; clean docs and sub-13
    partial overlaps are not flagged. Short docs (<13 tokens) fall
    back to whole-doc grams (the shingle_ngrams rule)."""
    from shmr_spark.queries import load_all

    w = [f"w{i}" for i in range(30)]
    train_text = " ".join(w)  # doc 1 (train: 1 % 5 != 0)
    # doc 0 (test): 13 tokens copied verbatim from train -> exactly
    # one shared 13-gram; surrounded by unique tokens
    leaked = " ".join(["u1", "u2"] + w[5:18] + ["u3", "u4"])
    # doc 5 (test): only a 12-token run -> no shared 13-gram
    partial = " ".join(["p1", "p2"] + w[5:17] + ["p3", "p4"])
    # doc 10 (test): short dup of a short train doc (doc 6)
    short = "tiny doc"
    rows = [
        (0, leaked),
        (1, train_text),
        (5, partial),
        (6, short),
        (10, short),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    import shmr_spark.queries.text as qt

    monkeypatch.setattr(qt, "load_table", lambda s, d, t: docs)
    got = {r.test_doc: r for r in qt.ngram_decontamination(spark, "unused").collect()}
    assert set(got) == {0, 10}
    assert got[0].n_shared_grams == 1
    assert got[0].n_test_grams == 17 - 13 + 1  # 17 tokens
    assert got[10].n_shared_grams == 1 and got[10].n_test_grams == 1
    assert got[10].contamination_frac == 1.0


def test_nb_classifier_matches_python(spark, sf_dir):
    """nb_classify ≡ a pure-Python multinomial NB with the same
    add-one smoothing, the same floor-quantized int64 scoring, and
    the same (score desc, class asc) tie rule, on the same subset."""
    from shmr_spark.functions.nb import nb_classify

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "lang", "text")
    )
    rows = {r.doc_id: (r.lang, r.text) for r in docs.collect()}
    cc: Counter = Counter()  # (tok, lang) -> count
    pri: Counter = Counter()  # lang -> train docs
    for doc_id, (lang, text) in rows.items():
        if doc_id % 5 != 0:
            pri[lang] += 1
            for tok in text.split(" "):
                cc[(tok, lang)] += 1
    ns = Counter()
    for (tok, lang), c in cc.items():
        ns[lang] += c
    v = len({tok for tok, _ in cc})
    d = sum(pri.values())

    def score(text, lang):
        s = math.floor(math.log(pri[lang] / d) * 1e6 + 0.5)
        for tok, cnt in Counter(text.split(" ")).items():
            lik = math.log((cc[(tok, lang)] + 1) / (ns[lang] + v))
            s += math.floor(lik * 1e6 + 0.5) * cnt
        return s

    want = {}
    for doc_id, (lang, text) in rows.items():
        if doc_id % 5 == 0:
            best = min((-score(text, s), s) for s in sorted(pri))
            want[doc_id] = (best[1], -best[0] / 1e6)

    got = {
        r.doc_id: (r.pred, r.score)
        for r in nb_classify(docs, "lang", F.col("doc_id") % 5 != 0).collect()
    }
    assert set(got) == set(want)
    for doc_id, (pred, score_v) in want.items():
        assert got[doc_id][0] == pred
        assert abs(got[doc_id][1] - score_v) < 2e-6


def test_nb_classifier_separates_vocab(spark):
    """Semantic check on a hand corpus with genuinely separated
    vocabularies: held-out docs written in a class's vocabulary get
    that class, and the hashed-feature variant (buckets below the
    vocabulary size, so collisions merge counts) still separates
    classes whose vocabularies stay distinct after bucketing."""
    from shmr_spark.functions.nb import nb_classify

    docs = spark.createDataFrame(
        [
            (1, "code", "def return import class lambda yield"),
            (2, "code", "import def lambda return def class"),
            (6, "prose", "the cat sat on the warm mat"),
            (7, "prose", "a dog ran across the green field"),
            (5, "code", "yield lambda import return def"),  # held out
            (10, "prose", "the cat ran on the field"),  # held out
        ],
        ["doc_id", "lang", "text"],
    )
    got = {
        r.doc_id: r.pred
        for r in nb_classify(docs, "lang", F.col("doc_id") % 5 != 0).collect()
    }
    assert got == {5: "code", 10: "prose"}

    hashed = {
        r.doc_id: r.pred
        for r in nb_classify(
            docs, "lang", F.col("doc_id") % 5 != 0, hash_buckets=8
        ).collect()
    }
    assert hashed == {5: "code", 10: "prose"}


def test_nb_margin_select_prefers_target_vocab(spark):
    """Hand corpus with separated vocabularies: the top-margin
    held-out document is the one written in the target class's
    vocabulary, k bounds the output, and order is (margin desc,
    id asc)."""
    from shmr_spark.functions.nb import nb_margin_select

    docs = spark.createDataFrame(
        [
            (1, "en", "alpha beta alpha gamma beta"),
            (2, "en", "alpha beta delta gamma"),
            (3, "fr", "omega psi chi phi"),
            (4, "fr", "psi omega phi chi chi"),
            (5, "en", "alpha beta gamma delta"),  # held out, target-like
            (10, "fr", "omega psi phi"),  # held out, rest-like
        ],
        ["doc_id", "lang", "text"],
    )
    got = nb_margin_select(
        docs, F.col("lang") == "en", F.col("doc_id") % 5 != 0, k=2
    ).collect()
    assert [r.doc_id for r in got] == [5, 10]
    assert got[0].margin > 0 > got[1].margin


def test_distinct_ngram_diversity_hand_corpus(spark, monkeypatch):
    """Per-doc distinct-n ratios on crafted docs, covering the
    fully-repetitive, all-distinct, alternating, and sub-n short-doc
    edges (the shingle_ngrams whole-text rule gives short docs
    ratio 1.0 over a denominator of 1)."""
    import shmr_spark.queries.text as qt

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),  # 1 distinct token, grams {"a a"}, {"a a a"}
            (2, "a b c d"),  # everything distinct
            (3, "x"),  # shorter than every n
            (4, "a b a b"),  # bigrams {a b, b a}, trigrams {a b a, b a b}
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(qt, "load_table", lambda s, d, t: docs)
    got = {r.doc_id: r for r in qt.distinct_ngram_diversity(spark, "unused").collect()}
    assert (got[1].n_tokens, got[1].distinct_1) == (4, 0.25)
    assert got[1].distinct_2 == 1.0 / 3.0 and got[1].distinct_3 == 0.5
    assert (got[2].distinct_1, got[2].distinct_2, got[2].distinct_3) == (1.0, 1.0, 1.0)
    assert (got[3].n_tokens, got[3].distinct_1) == (1, 1.0)
    assert (got[3].distinct_2, got[3].distinct_3) == (1.0, 1.0)
    assert (got[4].distinct_1, got[4].distinct_2, got[4].distinct_3) == (
        0.5,
        2.0 / 3.0,
        1.0,
    )


def test_source_unigram_kl_hand_corpus_exact(spark):
    """Hand-computable two-source corpus: A = 'a a b', B = 'a b b'
    (corpus a=3 b=3, N=6). Each source's KL is the exact quantized
    weighted sum (2·q(ln 4/3) + q(ln 2/3)) / 3e6 — identical for both
    by symmetry. A balanced corpus (both sources 'a b') gives every
    term ln(1) = 0, hence KL exactly 0.0."""
    from shmr_spark.functions.lm import source_unigram_kl

    docs = spark.createDataFrame(
        [(1, "a a b", "A"), (2, "a b b", "B")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in source_unigram_kl(docs).collect()}
    q_hi = math.floor(math.log(4.0 / 3.0) * 1e6 + 0.5)
    q_lo = math.floor(math.log(2.0 / 3.0) * 1e6 + 0.5)
    want = (2 * q_hi + q_lo) / 1e6 / 3.0
    for src in ("A", "B"):
        assert (got[src].n_tokens, got[src].vocab_size) == (3, 2)
        assert got[src].kl_vs_corpus == want
    assert want > 0

    flat = spark.createDataFrame(
        [(1, "a b", "A"), (2, "a b", "B")],
        "doc_id long, text string, source string",
    )
    for r in source_unigram_kl(flat).collect():
        assert r.kl_vs_corpus == 0.0


def test_source_unigram_kl_matches_python(spark, sf_dir):
    """Exact cross-check vs a pure-Python mirror of the quantized
    pipeline on the real corpus (the margin test in
    test_edge_cases.py proves the ln() quantization is safely clear
    of floor boundaries, so Python libm and JVM StrictMath floor to
    identical int64 terms)."""
    from shmr_spark.functions.lm import source_unigram_kl

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    by_src: dict[str, Counter] = {}
    for r in docs.collect():
        by_src.setdefault(r.source, Counter()).update(r.text.split(" "))
    corpus = Counter()
    for c in by_src.values():
        corpus.update(c)
    nn = sum(corpus.values())
    got = {r.source: r for r in source_unigram_kl(docs).collect()}
    assert set(got) == set(by_src)
    for src, cnt in by_src.items():
        n = sum(cnt.values())
        sq = sum(
            c * math.floor(math.log((c * nn) / (n * corpus[t])) * 1e6 + 0.5)
            for t, c in cnt.items()
        )
        r = got[src]
        assert (r.n_tokens, r.vocab_size) == (n, len(cnt))
        assert r.kl_vs_corpus == sq / 1e6 / n


def test_cross_source_overlap_hand_corpus(spark, monkeypatch):
    """Planted 8-gram overlap: s1's 9-token doc has two 8-grams, s2's
    8-token doc is s1's first 8-gram verbatim -> exactly one shared
    gram, Jaccard 1/(2+1-1) = 0.5. s3 (a short doc, whole-text gram)
    shares nothing and must not appear in any pair."""
    import shmr_spark.queries.text as qt

    w = [f"w{i}" for i in range(9)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(w), "s1"),
            (2, " ".join(w[:8]), "s2"),
            (3, "short doc", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    monkeypatch.setattr(qt, "load_table", lambda s, d, t: docs)
    rows = qt.cross_source_overlap(spark, "unused").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b) == ("s1", "s2")
    assert (r.n_shared, r.n_grams_a, r.n_grams_b) == (1, 2, 1)
    assert r.jaccard == 0.5


def test_cross_source_overlap_matches_python(spark, sf_dir):
    """Exact cross-check vs pure-Python per-source distinct 8-gram
    sets on the real corpus (exact int counts; Jaccard divides the
    same two int64s on both sides)."""
    import shmr_spark.queries.text as qt
    from itertools import combinations

    docs = load_table(spark, sf_dir, "documents")
    grams: dict[str, set] = {}
    for r in docs.select("source", "text").collect():
        toks = r.text.split(" ")
        g = (
            {" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)}
            if len(toks) >= 8
            else {r.text}
        )
        grams.setdefault(r.source, set()).update(g)
    want = {}
    for a, b in combinations(sorted(grams), 2):
        shared = len(grams[a] & grams[b])
        if shared:
            want[(a, b)] = (
                shared,
                len(grams[a]),
                len(grams[b]),
                shared / (len(grams[a]) + len(grams[b]) - shared),
            )
    got = {
        (r.source_a, r.source_b): (r.n_shared, r.n_grams_a, r.n_grams_b, r.jaccard)
        for r in qt.cross_source_overlap(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_zipf_slope_matches_python(spark, sf_dir):
    """zipf_slope ≡ a pure-Python replay of the full pipeline (count
    tokens, rank by (count desc, token), dsum-quantized OLS sums,
    round-6 slope) on the real corpus; the slope is negative (rank-1
    tokens are the most frequent) — non-vacuous."""
    import math

    from shmr_spark.queries import load_all

    docs = load_table(spark, sf_dir, "documents")
    cnt = Counter()
    for r in docs.select("text").collect():
        cnt.update(r.text.split(" "))
    ranked = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))

    def dsum(vals):
        return sum(math.floor(v * 1e6 + 0.5) for v in vals) / 1e6

    xs = [math.log(float(i + 1)) for i in range(len(ranked))]
    ys = [math.log(float(c)) for _, c in ranked]
    n = float(len(ranked))
    sx, sy = dsum(xs), dsum(ys)
    sxy = dsum([a * b for a, b in zip(xs, ys)])
    sxx = dsum([a * a for a in xs])
    want = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)

    row = load_all()["zipf_slope"].fn(spark, sf_dir).collect()[0]
    assert row.vocab_size == len(ranked)
    assert row.n_tokens == sum(cnt.values())
    assert row.zipf_slope == want
    assert row.zipf_slope < 0


def test_zipf_slope_hand_corpus_exact_power_law(spark, monkeypatch):
    """A corpus built to follow an exact power law — token t_r
    appears floor(64/r) times for ranks 1, 2, 4 (counts 64, 32,
    16) — has ln(c) = ln(64) − ln(r)·1 exactly at those points, so
    the fitted slope is −1.0 up to the 1e-6 quantization."""
    import shmr_spark.queries.text as qt

    words = ["a"] * 64 + ["b"] * 32 + ["c"] * 16
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    monkeypatch.setattr(qt, "load_table", lambda s, d, t: docs)
    row = qt.zipf_slope(spark, "unused").collect()[0]
    assert (row.vocab_size, row.n_tokens) == (3, 112)
    # ranks are 1,2,3 (not 1,2,4): counts 64,32,16 over ln-rank
    # {0, ln2, ln3} — the exact OLS of ln2-steps against ln-rank
    assert -1.35 < row.zipf_slope < -1.2
