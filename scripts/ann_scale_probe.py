#!/usr/bin/env python
"""ANN-family scale probe (VERDICT r11 item 4): the zipf treatment
for similarity retrieval.

PPJoin got measured candidate-ratio curves (PLANS_r11 §4); this probe
does the same for the ANN first-stage retrievers. It builds a
deterministic CLUSTERED embedding corpus at two scales (50k and 500k
vectors, 64-dim, 256 angular clusters — same geometry, 10x the
points) and measures, for 20 spread queries per scale:

- ``lsh``   — sign-LSH buckets (the package's md5-grid
              ``lsh_bucket_expr``, plane count scaled with log2(N) as
              a real deployment would) + Hamming<=1 multi-probe +
              exact cosine re-rank of the candidates;
- ``ivf``   — inverted lists with CELLS PROPORTIONAL TO N (the
              production rule; sim_topk_ivf's scale path), trained
              coarse centroids, nprobe=8 + exact re-rank;
- ``pq``    — product quantization in both the fixture key's
              oracle-checkable 4x16/k8 geometry and a trained
              production 8x8/k64 codebook, ADC stage-1 via a
              broadcast query LUT + exact re-rank;
- ``bq``    — 63-bit sign masks (emb_binary_quantize), Hamming
              stage-1 + exact re-rank.

Reported per method and scale: mean candidates/query, candidate
FRACTION of the corpus, and mean recall@10 against the exact cosine
top-10. Measured conclusions (scripts/ann_scale_results.json,
50k -> 500k -> 1.5M, a 30x span): IVF with cells ∝ N keeps
candidates FLAT (4745 -> 4061 -> 6309, a 1.3x drift over 30x
points) while recall HOLDS AND RISES (0.96 -> 0.985 -> 0.99) — the
headline sublinearity row; constant-stage-1 BQ/PQ lose recall at 10x points (density), and
the measured law is that stage-1 ∝ sqrt(N) restores it (bq 0.455 ->
0.525 at 316 candidates; trained pq 0.62 -> 0.64 at 158) — still
sublinear (bq sqrt(N) holds 0.54 at 1.5M; trained pq 0.545);
log2-plane LSH holds candidates flat but decays in recall
(0.39 -> 0.205 -> 0.11), consistent with its role as the textbook baseline
under the package's recall floors (extensions/recall.py). Everything
is Spark-side except the 20-query codebook/LUT constants (driver
numpy, broadcast as literals — exactly what a production serving
path ships to executors); IVF cell assignment is an Arrow-batched
pandas UDF, the documented vectorized-UDF case.

Determinism: corpus components are md5-grid pseudo-uniforms keyed on
(point, dim) — no RNG state, same corpus every run, so the JSON
artifact (scripts/ann_scale_results.json) is reproducible bit-for-bit.

Usage:
    python scripts/ann_scale_probe.py [N1 N2 ...]   # default 50000 500000
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DIM = 64
N_CLUSTERS = 256
NOISE = 0.55  # noise share: clusters are tight enough that ANN makes
# sense but loose enough that top-10 crosses cluster borders sometimes
N_QUERIES = 20
TOP_K = 10
PQ_SUBS, PQ_SUBDIM, PQ_K = 4, 16, 8
PQ_STAGE1 = 50
BQ_STAGE1 = 100


def _u(tag: str, a, b):
    """Deterministic pseudo-uniform in [-1, 1) from the md5 grid of
    (tag, a, b) — the same portable convention the package's LSH
    hyperplanes use (similarity.py:lsh_bucket_expr)."""
    m = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{tag}:"),
                        a.cast("string"),
                        F.lit(":"),
                        b.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100_000
    )
    return m.cast("double") / 50_000.0 - 1.0


def build_corpus(spark, n: int) -> str:
    """(vec_id, cluster, embedding array<double>[64]): point =
    normalize((1-NOISE)*center[cluster] + NOISE*noise(point)), centers
    and noise both md5-grid uniforms. UNIT-NORM like production
    embedding pipelines — it also makes L2 order cosine order, so the
    ADC stage (which quantizes L2) and the cosine truth measure the
    same neighbor structure. Cached under /tmp keyed on geometry."""
    out = os.path.join(
        tempfile.gettempdir(), f"cbs_ann_{n}_{N_CLUSTERS}_{int(NOISE*100)}n"
    )
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    dims = F.sequence(F.lit(0), F.lit(DIM - 1))
    raw = F.transform(
        dims,
        lambda d: (1.0 - NOISE) * _u("c", F.col("cluster"), d)
        + NOISE * _u("p", F.col("vec_id"), d),
    )
    df = (
        spark.range(n)
        .withColumnRenamed("id", "vec_id")
        .withColumn("cluster", F.col("vec_id") % N_CLUSTERS)
        .withColumn("_raw", raw)
        .withColumn(
            "_n",
            F.sqrt(
                F.aggregate(
                    F.col("_raw"), F.lit(0.0), lambda a, x: a + x * x
                )
            ),
        )
        .withColumn(
            "embedding",
            F.transform(F.col("_raw"), lambda x: x / F.col("_n")),
        )
        .drop("_raw", "_n")
        .repartition(32)
    )
    df.write.mode("overwrite").parquet(out)
    return out


def _np_corpus_queries(spark, path: str, n: int):
    """Collect the N_QUERIES spread query vectors (tiny)."""
    qids = [i * (n // N_QUERIES) for i in range(N_QUERIES)]
    rows = (
        spark.read.parquet(path)
        .filter(F.col("vec_id").isin(qids))
        .select("vec_id", "embedding")
        .collect()
    )
    return {r["vec_id"]: np.array(r["embedding"]) for r in rows}


def _queries_df(spark, queries: dict):
    return spark.createDataFrame(
        [(int(k), [float(x) for x in v]) for k, v in sorted(queries.items())],
        "qid long, qv array<double>",
    )


def _cos(vec_col, q_col):
    dot = F.aggregate(
        F.zip_with(vec_col, q_col, lambda x, y: x * y),
        F.lit(0.0),
        lambda a, p: a + p,
    )
    nv = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x)
    )
    nq = F.sqrt(F.aggregate(q_col, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (nv * nq)


def exact_truth(spark, path: str, queries: dict) -> dict:
    """{qid: [top-10 vec_ids by cosine]} — broadcast 20-query cross
    join + per-qid TakeOrdered (the brute-force baseline the fixture
    key sim_topk_cosine declares; here it is the probe's truth)."""
    e = spark.read.parquet(path)
    qdf = _queries_df(spark, queries)
    j = e.join(F.broadcast(qdf)).filter(F.col("vec_id") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.col("vec_id")
    )
    top = (
        j.select("qid", "vec_id", _cos("embedding", "qv").alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .collect()
    )
    out: dict = {}
    for r in top:
        out.setdefault(r["qid"], set()).add(r["vec_id"])
    return out


def _recall(per_q_ids: dict, truth: dict) -> float:
    rs = [
        len(per_q_ids.get(q, set()) & t) / len(t)
        for q, t in truth.items()
    ]
    return round(float(np.mean(rs)), 3)


def _collect_topk(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["qid"], set()).add(r["vec_id"])
    return out


def probe_lsh(spark, path: str, n: int, queries: dict, truth: dict) -> dict:
    """Plane count grows with log2(N) (6 planes at 50k, 10 at 500k —
    the bucket-occupancy rule every sign-LSH deployment applies), so
    candidates/query stay ~flat while the candidate FRACTION falls
    linearly in N. Probe set = query bucket union Hamming-1."""
    from clickhousebackup_spark.extensions.similarity import (
        lsh_bucket_expr,
    )

    planes = max(4, int(np.log2(n / 400)))
    e = spark.read.parquet(path).withColumn(
        "bucket", lsh_bucket_expr("embedding", n_planes=planes)
    )
    # bucket the 20 query vectors THROUGH THE SAME EXPRESSION, then
    # expand each to its Hamming<=1 probe set (planes+1 buckets)
    qdf = _queries_df(spark, queries).withColumn(
        "qbucket", lsh_bucket_expr("qv", n_planes=planes)
    )
    qrows = qdf.collect()
    probe_rows = []
    for r in qrows:
        probe_rows.append((r["qid"], r["qbucket"]))
        for i in range(planes):
            probe_rows.append((r["qid"], r["qbucket"] ^ (1 << i)))
    probes = spark.createDataFrame(probe_rows, "qid long, bucket long")
    cand = (
        e.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
    )
    n_cand = {
        r["qid"]: r["c"]
        for r in cand.groupBy("qid").agg(F.count("*").alias("c")).collect()
    }
    qv = _queries_df(spark, queries)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("vec_id"))
    top = (
        cand.join(F.broadcast(qv), "qid")
        .select("qid", "vec_id", _cos("embedding", "qv").alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
    )
    mean_cand = float(np.mean([n_cand.get(q, 0) for q in truth]))
    return {
        "planes": planes,
        "buckets": 1 << planes,
        "mean_candidates": round(mean_cand, 1),
        "candidate_fraction": round(mean_cand / n, 5),
        "recall_at_10": _recall(_collect_topk(top), truth),
    }


def probe_bq(spark, path: str, n: int, queries: dict, truth: dict,
             stage1: int = BQ_STAGE1) -> dict:
    """63-bit sign masks, Hamming stage-1 top-100, exact re-rank —
    candidates CONSTANT by construction; the claim under test is that
    recall holds as N grows 10x."""
    mask = F.expr(
        "aggregate(transform(sequence(0, 62),"
        " i -> IF(element_at(embedding, i + 1) > 0,"
        " shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),"
        " CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    e = spark.read.parquet(path).withColumn("mask", mask)
    qmasks = [
        (int(q), int(sum(1 << i for i in range(63) if v[i] > 0)))
        for q, v in sorted(queries.items())
    ]
    qm = spark.createDataFrame(qmasks, "qid long, qmask long")
    w = Window.partitionBy("qid").orderBy("hamming", "vec_id")
    s1 = (
        e.join(F.broadcast(qm))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "embedding",
            F.bit_count(F.col("mask").bitwiseXOR(F.col("qmask"))).alias(
                "hamming"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= stage1)
    )
    qv = _queries_df(spark, queries)
    w2 = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("vec_id"))
    top = (
        s1.join(F.broadcast(qv), "qid")
        .select("qid", "vec_id", _cos("embedding", "qv").alias("cosine"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= TOP_K)
    )
    return {
        "stage1": stage1,
        "mean_candidates": float(stage1),
        "candidate_fraction": round(stage1 / n, 5),
        "recall_at_10": _recall(_collect_topk(top), truth),
    }


def probe_pq(spark, path: str, n: int, queries: dict, truth: dict,
             subs: int = PQ_SUBS, subdim: int = PQ_SUBDIM,
             k: int = PQ_K, stage1: int = PQ_STAGE1) -> dict:
    """4x16 PQ, 8 centroids/sub (the sim_pq_adc_topk geometry), ADC
    stage-1 top-50 via broadcast LUT literals, exact re-rank. Unlike
    the fixture key (whose codebook is pinned to the first PQ_K
    vectors for oracle checkability), the probe TRAINS the codebook —
    deterministic per-subspace Lloyd iterations on a 2048-vector
    sample, driver-side numpy — because that is what the production
    serving path ships, and an untrained 8-entry codebook understates
    PQ recall by ~4x (measured 0.125 untrained vs trained below)."""
    sample = (
        spark.read.parquet(path)
        .filter(F.col("vec_id") < 2048)
        .select("vec_id", "embedding")
        .collect()
    )
    X = np.array(
        [r["embedding"] for r in sorted(sample, key=lambda r: r["vec_id"])]
    )

    def sub(v, s):
        return v[s * subdim : (s + 1) * subdim]

    # per-subspace Lloyd, deterministic init = evenly spaced sample rows
    C = {j: np.zeros(DIM) for j in range(k)}
    for s in range(subs):
        Xs = X[:, s * subdim : (s + 1) * subdim]
        cent = Xs[:: len(Xs) // k][:k].copy()
        for _ in range(10):
            d2 = ((Xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k):
                m = Xs[assign == j]
                if len(m):
                    cent[j] = m.mean(axis=0)
        for j in range(k):
            C[j][s * subdim : (s + 1) * subdim] = cent[j]

    e = spark.read.parquet(path)
    # code_s = argmin over PQ_K centroids of subspace L2 — array of
    # per-centroid dists, then array_position of its minimum
    code_cols = []
    for s in range(subs):
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.slice("embedding", s * subdim + 1, subdim),
                        F.array(
                            *[F.lit(float(x)) for x in sub(C[j], s)]
                        ),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda a, p: a + p,
                )
                for j in range(k)
            ]
        )
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1).alias(
                f"code{s}"
            )
        )
    coded = e.select("vec_id", "embedding", *code_cols)
    # query LUTs: lut[s][k] = L2(sub(q,s), sub(cent_k,s)) — driver
    # numpy, shipped as one literal array per query row
    lut_rows = []
    for q, v in sorted(queries.items()):
        lut = [
            [
                float(np.sum((sub(v, s) - sub(C[j], s)) ** 2))
                for j in range(k)
            ]
            for s in range(subs)
        ]
        lut_rows.append((int(q), lut))
    ldf = spark.createDataFrame(
        lut_rows, "qid long, lut array<array<double>>"
    )
    adc = None
    for s in range(subs):
        term = F.element_at(
            F.element_at("lut", s + 1), (F.col(f"code{s}") + 1).cast("int")
        )
        adc = term if adc is None else adc + term
    w = Window.partitionBy("qid").orderBy("adc", "vec_id")
    s1 = (
        coded.join(F.broadcast(ldf))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "embedding", adc.alias("adc"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= stage1)
    )
    qv = _queries_df(spark, queries)
    w2 = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("vec_id"))
    top = (
        s1.join(F.broadcast(qv), "qid")
        .select("qid", "vec_id", _cos("embedding", "qv").alias("cosine"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= TOP_K)
    )
    return {
        "geometry": f"{subs}x{subdim}d_k{k}",
        "stage1": stage1,
        "mean_candidates": float(stage1),
        "candidate_fraction": round(stage1 / n, 5),
        "recall_at_10": _recall(_collect_topk(top), truth),
    }


def probe_ivf(spark, path: str, n: int, queries: dict, truth: dict,
              nprobe: int = 8) -> dict:
    """IVF with CELL COUNT PROPORTIONAL TO N (n/500 cells, the
    production rule): candidates/query = nprobe * (N / cells) stays
    FLAT as N grows, and recall is held by the partitioning itself —
    the inverted-list structure every billion-vector deployment
    (FAISS IVF, SCaNN, Milvus) uses, and the scale path of the
    package's sim_topk_ivf. Coarse centroids are trained driver-side
    (deterministic Lloyd on a <=16k sample, BLAS matmul distances);
    cell assignment runs as an Arrow-batched pandas UDF (the numeric
    argmin over hundreds of centroids is exactly the vectorized-UDF
    case; literal expressions stop scaling past ~dozens of cells)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cells = max(16, n // 500)
    sample_n = min(16384, n)
    rows = (
        spark.read.parquet(path)
        .filter(F.col("vec_id") < sample_n)
        .select("vec_id", "embedding")
        .collect()
    )
    X = np.array(
        [r["embedding"] for r in sorted(rows, key=lambda r: r["vec_id"])]
    )
    cent = X[:: max(1, len(X) // cells)][:cells].copy()
    for _ in range(8):
        d2 = (
            (X**2).sum(1)[:, None]
            + (cent**2).sum(1)[None, :]
            - 2.0 * X @ cent.T
        )
        assign = d2.argmin(1)
        acc = np.zeros_like(cent)
        np.add.at(acc, assign, X)
        counts = np.bincount(assign, minlength=cells).astype(float)
        nz = counts > 0
        cent[nz] = acc[nz] / counts[nz, None]
    bc = spark.sparkContext.broadcast(cent)

    @pandas_udf("long")
    def cell_of(emb):  # no type hints: "from __future__ import
        # annotations" stringifies them and breaks eval-type
        # inference; hint-less pandas_udf defaults to SCALAR
        M = np.stack(emb.to_numpy())
        c = bc.value
        d2 = (
            (M**2).sum(1)[:, None]
            + (c**2).sum(1)[None, :]
            - 2.0 * M @ c.T
        )
        return pd.Series(d2.argmin(1))

    e = spark.read.parquet(path).withColumn("cell", cell_of("embedding"))
    probe_rows = []
    for q, v in sorted(queries.items()):
        qd = ((v[None, :] - cent) ** 2).sum(1)
        for c in np.argsort(qd)[:nprobe]:
            probe_rows.append((int(q), int(c)))
    probes = spark.createDataFrame(probe_rows, "qid long, cell long")
    cand = e.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("qid")
    )
    n_cand = {
        r["qid"]: r["c"]
        for r in cand.groupBy("qid").agg(F.count("*").alias("c")).collect()
    }
    qv = _queries_df(spark, queries)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("vec_id"))
    top = (
        cand.join(F.broadcast(qv), "qid")
        .select("qid", "vec_id", _cos("embedding", "qv").alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
    )
    mean_cand = float(np.mean([n_cand.get(q, 0) for q in truth]))
    return {
        "cells": cells,
        "nprobe": nprobe,
        "mean_candidates": round(mean_cand, 1),
        "candidate_fraction": round(mean_cand / n, 5),
        "recall_at_10": _recall(_collect_topk(top), truth),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 500_000]
    from clickhousebackup_spark.session import get_spark

    spark = get_spark("cbs-ann-scale-probe")
    report: dict = {
        "dim": DIM,
        "clusters": N_CLUSTERS,
        "noise": NOISE,
        "n_queries": N_QUERIES,
        "scales": {},
    }
    for n in sizes:
        t0 = time.perf_counter()
        path = build_corpus(spark, n)
        queries = _np_corpus_queries(spark, path, n)
        truth = exact_truth(spark, path, queries)
        sqrt_scale = (n / 50_000) ** 0.5
        row = {
            "lsh": probe_lsh(spark, path, n, queries, truth),
            # the production scale design: cells grow with N, so
            # candidates/query stay FLAT and recall is held by the
            # partitioning — the headline sublinearity row.
            "ivf": probe_ivf(spark, path, n, queries, truth),
            # the fixture key's oracle-checkable geometry (4 subs x
            # 16 dims, 8 centroids = 12-bit codes) AND the
            # production-shaped codebook (8 subs x 8 dims, 64
            # centroids = 48-bit codes) a real 100 TB deployment
            # trains — the fixture geometry's recall is bounded by
            # its 4096 distinct codes, which is the point of
            # publishing both.
            "pq_key_geometry": probe_pq(spark, path, n, queries, truth),
            "pq_trained_8x64": probe_pq(
                spark, path, n, queries, truth,
                subs=8, subdim=8, k=64, stage1=PQ_STAGE1,
            ),
            "bq": probe_bq(spark, path, n, queries, truth),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        # constant-stage-1 BQ/PQ lose recall as N grows (density:
        # true top-10 hide behind more quantization ties); the
        # measured scaling law is that stage-1 ~ sqrt(N) restores it
        # — still sublinear candidates (3.2x for 10x points).
        if sqrt_scale > 1.01:
            row["bq_stage1_sqrtN"] = probe_bq(
                spark, path, n, queries, truth,
                stage1=int(BQ_STAGE1 * sqrt_scale),
            )
            row["pq_trained_8x64_stage1_sqrtN"] = probe_pq(
                spark, path, n, queries, truth,
                subs=8, subdim=8, k=64,
                stage1=int(PQ_STAGE1 * sqrt_scale),
            )
            row["wall_s"] = round(time.perf_counter() - t0, 1)
        print(f"# n={n}: {json.dumps(row)}", file=sys.stderr)
        report["scales"][str(n)] = row
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
