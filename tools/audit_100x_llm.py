"""100x audit for the LLM-pipeline flagship operators.

Companion to tools/audit_100x.py (relational set): measures
shuffle-write bytes and wall on the 10x and 100x derived corpora for
the pipeline operators whose 100 TB story is the engine's core claim
— MinHash near-dup dedup in its production banding shape, the
LSH-bucketed kNN join, the storage-pruned ANN index, the Misra-Gries
heavy-hitters sketch, and the composed training pipeline.

Denominator note (same as the bench docstring): make_scaled
replicates document TEXTS verbatim n times, so TRUE near-dup pair
work grows ~n^2 per cluster — at 100x the verify stage faces ~10,000x
the base pair count. The claim under test is that the EXCHANGE stays
~linear in documents (banding), with the quadratic part remaining
partition-local compute. duplicate_spans is deliberately excluded at
100x: its postings JOIN is pairwise per duplicated gram, so the
replication artifact (not the operator) makes its exchange ~n^2 by
construction — the 10x row in BENCH_QUIET_r09.json already shows
that artifact, and a real corpus does not contain 100 verbatim
copies of every document.

Run: python tools/audit_100x_llm.py  (writes AUDIT_100X_LLM.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shmr_spark.metrics import noop_sink, shuffle_bytes_of  # noqa: E402
from shmr_spark.session import get_spark  # noqa: E402


from shmr_spark.prod_shapes import (  # noqa: E402
    dedup_minhash_prod as _dedup_minhash_prod,
    knn_join_lsh_prod as _knn_join_lsh_prod,
    pipeline_e2e as _pipeline_e2e,
)


def _knn_join_lsh_fixed_probes(spark, sf_dir):
    # production framing: a FIXED probe set (200 vectors from the
    # base-copy id range, constant across corpus scales) against the
    # growing corpus — bench's prod shape scales probes WITH the
    # corpus (vec_id % 100), which makes per-bucket rerank work grow
    # ~quadratically across a 10x step and muddies the corpus-scaling
    # read; this variant isolates it
    from pyspark.sql import functions as F

    from shmr_spark.catalog import load_table
    from shmr_spark.similarity.knn import knn_join_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 2000))
    return knn_join_lsh(probes, emb, k=5, n_planes=8, radius=1)


def main() -> None:
    spark = get_spark(app_name="shmr_audit_100x_llm")
    from tools.make_scaled_sf import make_scaled

    from shmr_spark.queries import load_all

    reg = load_all()
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    d10 = os.path.join(REPO, ".scaled", "sf1")
    d100 = os.path.join(REPO, ".scaled", "sf10_100x")
    make_scaled(spark, 10, base, d10)
    make_scaled(spark, 100, base, d100)

    specs = {
        "heavy_hitters_tokens": reg["heavy_hitters_tokens"].fn,
        "similarity_indexed_topk": reg["similarity_indexed_topk"].fn,
        "knn_join_lsh_prod": _knn_join_lsh_prod,
        "knn_join_lsh_fixed_probes": _knn_join_lsh_fixed_probes,
        "dedup_minhash_prod": _dedup_minhash_prod,
        "pipeline_e2e": _pipeline_e2e,
        # r11: DSIR selection — distinct-(doc,token) exchange, fixed-k
        # TakeOrdered; expected byte-linear (~10.9x measured)
        "dsir_select": reg["dsir_select"].fn,
    }

    # rows whose 100x wall is weather-hostage (BUILD_LOG §43:
    # 161/116/299 s over byte-identical plans — a 2.6x spread no
    # single number should headline): publish bytes only, which
    # reproduce to the row, and keep wall for the 10x tier where the
    # spread is pennies
    bytes_only_100x = {"dedup_minhash_prod"}

    out: dict[str, dict] = {}
    for name, fn in specs.items():
        row: dict = {}
        for label, d in (("10x", d10), ("100x", d100)):
            t0 = time.perf_counter()
            bytes_ = shuffle_bytes_of(spark, lambda: noop_sink(fn(spark, d)))
            wall = round(time.perf_counter() - t0, 3)
            if label == "100x" and name in bytes_only_100x:
                row[label] = {
                    "write_bytes": bytes_["write"],
                    "wall": None,
                    "wall_note": "weather-hostage (2.6x same-plan spread, "
                    "BUILD_LOG §43) — compare by bytes",
                }
            else:
                row[label] = {"write_bytes": bytes_["write"], "wall": wall}
        w10, w100 = row["10x"]["write_bytes"], row["100x"]["write_bytes"]
        row["byte_ratio_100x_over_10x"] = round(w100 / w10, 2) if w10 else None
        out[name] = row
        print(name, json.dumps(row), flush=True)

    with open(os.path.join(REPO, "AUDIT_100X_LLM.json"), "w") as f:
        json.dump({"queries": out}, f, indent=1, sort_keys=True)
    print(json.dumps({"done": True}))


if __name__ == "__main__":
    main()
