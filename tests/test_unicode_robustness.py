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
