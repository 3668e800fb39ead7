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
