"""Adversarial-text robustness: a web-scale corpus contains emoji/ZWJ
clusters, unspaced CJK, RTL runs with bidi controls, NFC-vs-NFD
diacritics, zero-width characters, NUL bytes, and megabyte single
tokens. Every text-tier expression must stay total (no exception, no
NULL for non-NULL input), deterministic, and byte-consistent with the
Python ground truth where one exists (md5 over UTF-8).
"""

from __future__ import annotations

import hashlib
import unicodedata

import pytest
from pyspark.sql import functions as F

from shmr_spark.dedup.minhash import minhash_signature, shingle_ngrams
from shmr_spark.functions.hashing import fingerprint_md5
from shmr_spark.functions.text import (
    lang_id,
    quality_score,
    token_count,
    token_count_re,
)

ADVERSARIAL = [
    "👩‍👩‍👧‍👦 family 👨🏽‍🚀 emoji \U0001f600‍ test",  # ZWJ sequences
    "深層学習のモデルは大量のデータを必要とする",  # unspaced CJK
    "مرحبا بالعالم ‮REVERSED‬ end",  # RTL + bidi controls
    "café vs café NFD/NFC",  # combining diacritics
    "zero​width‌space﻿BOM",  # zero-width + BOM
    "nul\x00byte and \x01控制 chars\x1f",  # control chars
    "x" * 100_000,  # megabyte-ish single token
    ("word " * 5000).strip(),  # many tiny tokens
    "\t\n\r\v\f mixed whitespace only \t",
    "ᚠᚢᚦᚨᚱᚲ ῥυθμός Ωμέγα ΣΊΓΜΑ lower/UPPER edge",
]


def test_text_expressions_total_on_adversarial_input(spark):
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        token_count("text").alias("ws"),
        token_count_re("text").alias("re"),
        lang_id("text").alias("lang"),
        quality_score("text").alias("q"),
        fingerprint_md5("text").alias("fp"),
        F.size(shingle_ngrams("text", 3)).alias("n_shingles"),
    ).collect()
    assert len(out) == len(ADVERSARIAL)
    for r in out:
        assert r.ws is not None and r.ws >= 1  # split never yields []
        assert r.re is not None and r.re >= 0
        assert isinstance(r.lang, str) and r.lang != ""
        assert r.q is not None and 0.0 <= r.q <= 1.5
        assert r.fp is not None and len(r.fp) == 32
        assert r.n_shingles >= 0

    # determinism: a second evaluation of the same expressions over a
    # repartitioned input produces identical values row-for-row
    again = {
        r.doc_id: (r.ws, r.re, r.lang, r.q, r.fp, r.n_shingles)
        for r in df.repartition(7)
        .select(
            "doc_id",
            token_count("text").alias("ws"),
            token_count_re("text").alias("re"),
            lang_id("text").alias("lang"),
            quality_score("text").alias("q"),
            fingerprint_md5("text").alias("fp"),
            F.size(shingle_ngrams("text", 3)).alias("n_shingles"),
        )
        .collect()
    }
    assert again == {
        r.doc_id: (r.ws, r.re, r.lang, r.q, r.fp, r.n_shingles) for r in out
    }


def test_raw_md5_matches_python_bytes(spark):
    """fingerprint_md5(normalize=False) must hash the exact UTF-8
    bytes — multi-byte, ZWJ, and NUL content included — so content
    hashes agree with ANY engine hashing the same bytes."""
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", fingerprint_md5("text", normalize=False).alias("fp")
        ).collect()
    }
    want = {
        i: hashlib.md5(t.encode("utf-8")).hexdigest()
        for i, t in rows
    }
    assert got == want


def test_minhash_signature_unicode_stable(spark):
    """Signatures over multi-byte shingles are stable across
    partitionings and differ between NFC and NFD spellings (the engine
    hashes code points, not display forms — byte-level dedup treats
    them as distinct documents, same as the md5 tier)."""
    nfd = unicodedata.normalize("NFD", "café résumé naïve")
    nfc = unicodedata.normalize("NFC", "café résumé naïve")
    df = spark.createDataFrame(
        [(1, nfd), (2, nfc)], "doc_id long, text string"
    )
    sigs = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id",
            minhash_signature(shingle_ngrams("text", 3), 32).alias("sig"),
        ).collect()
    }
    assert len(sigs[1]) == 32 and len(sigs[2]) == 32
    assert sigs[1] != sigs[2]
    rerun = {
        r.doc_id: r.sig
        for r in df.repartition(5)
        .select(
            "doc_id",
            minhash_signature(shingle_ngrams("text", 3), 32).alias("sig"),
        )
        .collect()
    }
    assert rerun == sigs


@pytest.mark.heavy  # slow evidence re-derivation; run via `pytest -m heavy` each round
def test_prehashed_shingle_path_equals_string_path_on_adversarial_text(spark):
    """The hashed-shingle verify optimization (BUILD_LOG §44) must not
    diverge on web-crawl garbage: for adversarial texts plus seeded
    random unicode soup, the pre-hashed path's signatures are
    bit-identical to the string path's, and exact Jaccard over hashed
    sets equals Jaccard over string sets pair-for-pair."""
    import random

    from shmr_spark.dedup.minhash import minhash_signatures_df

    rng = random.Random(20260815)
    soup = [
        "".join(
            chr(rng.choice([rng.randint(32, 0x2FFF), rng.randint(0x1F300, 0x1F64F)]))
            if rng.random() < 0.3
            else chr(rng.randint(97, 122))
            for _ in range(rng.randint(0, 120))
        )
        for _ in range(40)
    ]
    texts = ADVERSARIAL + soup
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sh_str = df.select(
        F.col("doc_id").alias("__id"), shingle_ngrams("text", 3).alias("__sh")
    )
    sh_hash = sh_str.select(
        "__id", F.transform("__sh", lambda s: F.xxhash64(s)).alias("__sh")
    )
    a = {r["__id"]: r.sig for r in minhash_signatures_df(sh_str, "__id").collect()}
    b = {r["__id"]: r.sig for r in minhash_signatures_df(sh_hash, "__id").collect()}
    assert a == b and len(a) == len(texts)

    # exact Jaccard per pair: hashed == string (no collisions on this
    # input, and none expected before ~2^32 distinct shingles)
    def jac(frame):
        x = frame.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
        y = frame.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
        return {
            (r.id_a, r.id_b): r.j
            for r in x.join(y, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                (
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b"))
                ).alias("j"),
            )
            .collect()
        }

    assert jac(sh_str) == jac(sh_hash)
