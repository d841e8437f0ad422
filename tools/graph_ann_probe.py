"""Graph-vs-IVF ANN decision probe (round-9 verdict item 3).

Measures, at the same 2 M-vector replicated corpus the STRESS ivf_search
shape uses (sf0.1 embeddings × 1000, vec_id offsets per replica):

- k-NN-graph BUILD cost (blocked Arrow matmul, ``build_knn_graph_blocked``)
  vs one Lloyd round (the IVF build unit);
- beam-search SERVING latency for the 5-query batch (3 hops over the
  persisted graph) vs the IVF multi-probe search shape;
- the recall-vs-corpus-size trend of the exact-graph beam search at
  sf0.001/0.01/0.1 (the corpus is isotropic pseudo-random 64-d, so graph
  navigability DEGRADES with size — the core of the negative result).

Writes GRAPHANN.json at the repo root. The decision itself is recorded
in operators/graphann.py's module docstring; this artifact is its
evidence. Usage: python tools/graph_ann_probe.py [replicas=50]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from caseguarddatapipeline_spark.operators.graphann import (  # noqa: E402
    build_knn_graph_blocked,
    e2_graph_recall,
    graph_beam_search,
)
from caseguarddatapipeline_spark.operators.similarity import (  # noqa: E402
    _dbl,
    _ivf1_index,
    _ivf_candidates,
    _lloyd_round,
)
from caseguarddatapipeline_spark.session import get_spark  # noqa: E402
from caseguarddatapipeline_spark.sources import load_table  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("graph-ann-probe")

    embt = load_table(spark, sf_dir, "embeddings")
    max_vec = embt.agg(F.max("vec_id")).collect()[0][0] + 1
    reps = F.explode(F.sequence(F.lit(0), F.lit(n * 20 - 1))).alias("rep")
    emb_n = (
        embt.select("vec_id", "embedding")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("*", reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(max_vec)).alias("vec_id"),
            "embedding",
        )
    )
    emb_n.cache()
    vec_rows = emb_n.count()

    # ---- build cost: blocked kNN graph vs one Lloyd round ----
    n_buckets = max(32, vec_rows // 4000)
    t0 = time.perf_counter()
    graph = build_knn_graph_blocked(emb_n, n_buckets=n_buckets, use_arrow=True)
    graph.write.format("noop").mode("overwrite").save()
    graph_build_sec = time.perf_counter() - t0

    seeds_ivf, cents_ivf = _ivf1_index(spark, sf_dir)
    corpus = emb_n.select("vec_id", _dbl(F.col("embedding")).alias("emb"))
    t0 = time.perf_counter()
    _lloyd_round(corpus, seeds_ivf)
    lloyd_round_sec = time.perf_counter() - t0

    # ---- serving latency: 3-hop beam batch vs IVF multi-probe ----
    graph_c = graph.cache()
    graph_edges = graph_c.count()  # materialize once, like a persisted index
    beam = lambda: graph_beam_search(emb_n, graph_c).agg(  # noqa: E731
        F.count(F.lit(1)), F.sum("cosine")
    )
    beam().write.format("noop").mode("overwrite").save()  # warm
    best_beam = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        beam().write.format("noop").mode("overwrite").save()
        best_beam = min(best_beam, time.perf_counter() - t0)

    ivf = lambda: _ivf_candidates(  # noqa: E731
        emb_n, seeds_ivf, cents_ivf, use_arrow=True
    ).agg(F.count(F.lit(1)), F.sum("cosine"))
    ivf().write.format("noop").mode("overwrite").save()
    best_ivf = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ivf().write.format("noop").mode("overwrite").save()
        best_ivf = min(best_ivf, time.perf_counter() - t0)

    # ---- recall trend of the exact-graph prototype across sf dirs ----
    recall = {}
    for sf in ("0.001", "0.01", "0.1"):
        r = e2_graph_recall(spark, f"/root/testdata/sf{sf}").collect()[0]
        recall[f"sf{sf}"] = r["recall"]

    doc = {
        "metric": "graph_ann_decision",
        "corpus_vectors": vec_rows,
        "graph": {
            "build_sec": round(graph_build_sec, 3),
            "edges": graph_edges,
            "n_buckets": n_buckets,
            "beam_batch_sec": round(best_beam, 3),
            "recall_at3_exact_graph": recall,
        },
        "ivf": {
            "lloyd_round_sec": round(lloyd_round_sec, 3),
            "probe_batch_sec": round(best_ivf, 3),
            "recall_at3_pinned": ">=0.9 (tests/test_similarity.py)",
        },
        "decision": (
            "IVF(-SQ8/-PQ) stays the serving tier: the beam's H sequential "
            "join rounds cost more wall-clock than one partition-pruned "
            "probe at equal batch size, the blocked graph build costs a "
            "multiple of a Lloyd round, and on this isotropic corpus "
            "graph recall degrades with corpus size while IVF recall is "
            "probe-fraction-controlled. Graph prototype retained, "
            "exact-oracle-checked, for point-lookup export scenarios."
        ),
    }
    Path(__file__).resolve().parent.parent.joinpath("GRAPHANN.json").write_text(
        json.dumps(doc, indent=1) + "\n"
    )
    print(json.dumps(doc))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
