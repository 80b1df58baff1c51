"""ROADMAP #11: Arrow batch sizing sweep for the multimodal decode
stage.

``mapInPandas`` ships partitions to the Python worker in Arrow batches
of ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows (default
10000). Batch size trades per-batch overhead (pickle/ffi dispatch,
pandas frame construction) against peak worker memory (a batch of
payload bytes must fit at once — at real image sizes the BYTES, not
the row count, bound the batch). This sweep measures the decode stage
end-to-end at several batch sizes over a synthetically replicated
corpus so the per-batch fixed cost is visible.

Usage: python tools/arrow_batch_sweep.py [--factor=20] [sf_dir]
Writes results to stdout as one JSON line (appended to docs by hand —
this is a one-off diagnostic, not a per-round artifact).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from institutional_fx_etl_spark import get_spark  # noqa: E402
from institutional_fx_etl_spark.operators.multimodal import (  # noqa: E402
    attach_binary_payload,
    decode_features,
)

BATCH_SIZES = [500, 2_000, 10_000, 50_000]


def main() -> None:
    factor = 20
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--factor="):
            factor = int(a.split("=", 1)[1])
        else:
            sf_dir = a

    spark = get_spark(app_name="arrow_batch_sweep")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if factor > 1:
        docs = docs.select(
            "text",
            "doc_id",
            F.explode(F.expr(f"sequence(0, {factor - 1})")).alias("__c"),
        ).selectExpr("text", "doc_id + __c * 10000000 AS doc_id")
    corpus = attach_binary_payload(docs).persist()
    n = corpus.count()  # materialize once; sweep measures decode only

    results = {}
    for bs in BATCH_SIZES:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", bs)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            decode_features(corpus).agg(F.sum("byte_len")).collect()
            walls.append(time.perf_counter() - t0)
        results[str(bs)] = round(min(walls), 3)
        print(f"[arrow_sweep] batch={bs}: best {results[str(bs)]}s", flush=True)
    spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    corpus.unpersist()
    print(json.dumps({"rows": n, "factor": factor, "walls_s": results}))


if __name__ == "__main__":
    raise SystemExit(main())
