"""Deduplication operators for the LLM-data pipeline (BASELINE.json
north star): exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine. All native Column/DataFrame compositions — no
Python UDFs — so they scale with codegen and AQE.
"""

from shmr_spark.dedup.exact import dedup_exact_keep_first
from shmr_spark.dedup.minhash import (
    shingle_ngrams,
    minhash_signature,
    lsh_candidates,
    minhash_near_duplicates,
)
from shmr_spark.dedup.simhash import simhash64, simhash60_md5, simhash_near_duplicates
from shmr_spark.dedup.embedding import embedding_near_duplicates
from shmr_spark.dedup.semantic import semantic_dedup
from shmr_spark.dedup.spans import duplicate_span_stats, duplicated_ngram_spans

__all__ = [
    "duplicate_span_stats",
    "duplicated_ngram_spans",
    "dedup_exact_keep_first",
    "shingle_ngrams",
    "minhash_signature",
    "lsh_candidates",
    "minhash_near_duplicates",
    "simhash64",
    "simhash60_md5",
    "simhash_near_duplicates",
    "embedding_near_duplicates",
    "semantic_dedup",
]
