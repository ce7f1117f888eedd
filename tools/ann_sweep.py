"""ANN parameter sweep: recall-vs-latency for the IVF family against
the exact brute-force top-k, printed as one JSON line.

The sweep answers the deployment question directly — "which n_probe do
I run at my recall target?" — instead of guessing: for each n_probe it
measures median search wall-time (noop sink, warm index) and recall@k
vs the exact result on the same fixture.

Usage: python tools/ann_sweep.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_adventureworks2022_spark.operators import similarity  # noqa: E402
from lakehouse_adventureworks2022_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-sweep")
    q, cand = similarity.embedding_queries(spark, sf_dir)

    exact = {
        (r["query_id"], r["cand_id"])
        for r in similarity.cosine_topk(q, cand, k=k).collect()
    }
    n_q = len({a for a, _ in exact})

    centroids, cells = similarity.ivf_build(cand)
    cells = cells.persist()
    cells.count()  # warm the index like a deployed search would

    sweep = []
    for n_probe in (1, 2, 4, 8, 16):
        times = []
        for _ in range(3):
            t = time.perf_counter()
            similarity.ivf_search(
                q, centroids, cells, k=k, n_probe=n_probe
            ).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t)
        got = {
            (r["query_id"], r["cand_id"])
            for r in similarity.ivf_search(
                q, centroids, cells, k=k, n_probe=n_probe
            ).collect()
        }
        sweep.append(
            {
                "n_probe": n_probe,
                "recall": round(len(got & exact) / len(exact), 4),
                "median_search_sec": round(statistics.median(times), 3),
            }
        )
    cells.unpersist()

    pq_sweep = []
    for rerank in (2, 8, 16):
        times = []
        for _ in range(3):
            t = time.perf_counter()
            similarity.cosine_topk_pq(
                q, cand, k=k, rerank=rerank
            ).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t)
        got = {
            (r["query_id"], r["cand_id"])
            for r in similarity.cosine_topk_pq(
                q, cand, k=k, rerank=rerank
            ).collect()
        }
        pq_sweep.append(
            {
                "rerank": rerank,
                "recall": round(len(got & exact) / len(exact), 4),
                "median_sec_incl_encode": round(statistics.median(times), 3),
            }
        )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "k": k,
                "n_queries": n_q,
                "ivf": sweep,
                "pq": pq_sweep,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
