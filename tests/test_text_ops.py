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
