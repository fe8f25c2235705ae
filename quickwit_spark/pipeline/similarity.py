"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k against a query vector. The dot
  product stays JVM-side (zip_with + aggregate over doubles, sequential
  fold => deterministic, oracle-matchable).
- lsh_bucket_topk: the scale path — random-hyperplane LSH buckets the
  corpus; only the query's bucket (plus optional multi-probe neighbors)
  is scanned. Hyperplanes derive deterministically from a seed.

At 100 TB the brute-force path is a full scan (still shuffle-free, one map
stage + a top-k); the LSH path prunes the scan by 2^nbits with a bucketed
join on the signature — each variant is one narrow dependency chain.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot_expr(a: str, b) -> "F.Column":
    """Deterministic f64 dot product: elementwise multiply then ordered
    fold (matches a sequential SQL loop / DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(F.col(a), b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_topk(emb: DataFrame, query_df: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """Exact cosine top-k of `emb` rows against the single-row query_df
    (columns: q array<float>). Returns (vec_id, cos) ordered."""
    j = emb.crossJoin(F.broadcast(query_df))
    dot = _dot_expr(vec_col, F.col("q"))
    na = F.sqrt(_dot_expr(vec_col, F.col(vec_col)))
    nb = F.sqrt(_dot_expr("q", F.col("q")))
    scored = j.select(F.col(id_col),
                      (dot / (na * nb)).alias("_cos"))
    return (scored.orderBy(F.col("_cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, F.round("_cos", 6).alias("cos")))


def hyperplanes(dim: int, nbits: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).astype(np.float64)


def signature_expr(vec_col: str, planes: np.ndarray):
    """Sign-bit LSH signature as an integer column (JVM-side arithmetic)."""
    sig = None
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot_expr(vec_col, arr) > 0, F.lit(1 << j)) \
            .otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig


def train_ivf_centroids(emb: DataFrame, n_centroids: int = 16,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        sample: int = 2048, iters: int = 10,
                        seed: int = 42) -> np.ndarray:
    """Deterministic k-means coarse quantizer trained on a driver-side
    sample (IVF training is always a sampled, driver/parameter-server
    step; assignment is the distributed part). Lloyd's algorithm with
    seeded init over an id-ordered sample; empty clusters re-seeded
    deterministically."""
    pdf = emb.orderBy(id_col).select(vec_col).limit(sample).toPandas()
    X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)),
                        replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = X[m].mean(axis=0)
            else:
                cent[c] = X[rng.integers(0, len(X))]
    return np.round(cent, 6)


def ivf_assign_expr(vec_col: str, centroids: np.ndarray):
    """Nearest-centroid id as a JVM-side expression: a flat distance
    array + array_min/array_position argmin (first-min tie-break, same as
    the SQL oracle's list_indexof(ds, list_min(ds))). Flat arrays keep
    codegen linear in n_centroids — the earlier nested CASE-WHEN chain
    blew up expression depth past ~64 centroids."""
    dists = []
    for c in centroids:
        lits = F.array(*[F.lit(float(x)) for x in c])
        # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2; compare via -2v.c + ||c||^2
        dists.append(F.lit(float((c * c).sum()))
                     - F.lit(2.0) * _dot_expr(vec_col, lits))
    ds = F.array(*dists)
    return (F.array_position(ds, F.array_min(ds)) - F.lit(1)).cast("int")


def ivf_topk(emb: DataFrame, query_df: DataFrame, centroids: np.ndarray,
             k: int = 10, nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF ANN, ad-hoc variant: assigns the corpus to centroids inline
    and scans only the nprobe nearest inverted lists. This prunes
    COMPUTE, not I/O — every query still reads the whole corpus to
    evaluate the assignment expression. For the scale path, write the
    layout once with ivf_partition and query via ivf_topk_partitioned,
    which reads only the probed partitions' files."""
    import pandas as pd

    q = query_df.first()["q"]
    qv = np.asarray(q, dtype=np.float64)
    d2 = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2)[:nprobe]]
    bucketed = emb.withColumn("_cid", ivf_assign_expr(vec_col, centroids))
    cand = bucketed.filter(F.col("_cid").isin(probes)) \
        .crossJoin(F.broadcast(query_df))
    dot = _dot_expr(vec_col, F.col("q"))
    na = F.sqrt(_dot_expr(vec_col, F.col(vec_col)))
    nb = F.sqrt(_dot_expr("q", F.col("q")))
    scored = cand.select(F.col(id_col), (dot / (na * nb)).alias("_cos"))
    return (scored.orderBy(F.col("_cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, F.round("_cos", 6).alias("cos")))


def ivf_partition(emb: DataFrame, out_dir: str, centroids: np.ndarray,
                  vec_col: str = "embedding") -> str:
    """One-time IVF layout write: assign every row to its nearest
    centroid and write the corpus partitioned by the centroid id (ONE
    assignment shuffle, ever). After this, ivf_topk_partitioned reads
    only the nprobe probed partitions — nprobe/n_centroids of the BYTES,
    not just of the compute (the split-pruning idea of
    quickwit-search leaf.rs:697-810 applied to ANN inverted lists).

    Centroids are persisted beside the data so queries don't re-train."""
    import json as _json
    import os as _os
    assigned = emb.withColumn("_cid", ivf_assign_expr(vec_col, centroids))
    (assigned.write.mode("overwrite").partitionBy("_cid")
     .parquet(out_dir))
    try:  # POSIX/local path; on an object store ship centroids yourself
        with open(_os.path.join(out_dir, "_ivf_centroids.json"), "w") as f:
            _json.dump({"centroids": centroids.tolist()}, f)
    except OSError:
        pass
    return out_dir


def load_ivf_centroids(layout_dir: str) -> np.ndarray:
    import json as _json
    import os as _os
    with open(_os.path.join(layout_dir, "_ivf_centroids.json")) as f:
        return np.asarray(_json.load(f)["centroids"], dtype=np.float64)


def ivf_topk_partitioned(spark, layout_dir: str, query_df: DataFrame,
                         k: int = 10, nprobe: int = 2,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         centroids: np.ndarray | None = None) -> DataFrame:
    """IVF ANN over an ivf_partition layout: the `_cid IN probes` filter
    is a PARTITION filter (check .explain(): PartitionFilters, not
    PushedFilters), so Spark lists and reads only the probed inverted
    lists' files. Results are identical to ivf_topk on the same corpus
    and centroids."""
    if centroids is None:
        centroids = load_ivf_centroids(layout_dir)
    q = query_df.first()["q"]
    qv = np.asarray(q, dtype=np.float64)
    d2 = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]
    scan = (spark.read.parquet(layout_dir)
            .filter(F.col("_cid").isin(probes)))
    cand = scan.crossJoin(F.broadcast(query_df))
    dot = _dot_expr(vec_col, F.col("q"))
    na = F.sqrt(_dot_expr(vec_col, F.col(vec_col)))
    nb = F.sqrt(_dot_expr("q", F.col("q")))
    scored = cand.select(F.col(id_col), (dot / (na * nb)).alias("_cos"))
    return (scored.orderBy(F.col("_cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, F.round("_cos", 6).alias("cos")))


def lsh_bucket_topk(emb: DataFrame, query_df: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    nbits: int = 8, seed: int = 42) -> DataFrame:
    """ANN: restrict the exact cosine scan to the query's LSH bucket."""
    dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, nbits, seed)
    bucketed = emb.withColumn("_sig", signature_expr(vec_col, planes))
    qb = query_df.withColumn("_qsig", signature_expr("q", planes))
    cand = bucketed.join(F.broadcast(qb),
                         F.col("_sig") == F.col("_qsig"))
    dot = _dot_expr(vec_col, F.col("q"))
    na = F.sqrt(_dot_expr(vec_col, F.col(vec_col)))
    nb = F.sqrt(_dot_expr("q", F.col("q")))
    scored = cand.select(F.col(id_col), (dot / (na * nb)).alias("_cos"))
    return (scored.orderBy(F.col("_cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, F.round("_cos", 6).alias("cos")))
