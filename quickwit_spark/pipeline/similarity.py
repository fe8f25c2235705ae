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


def _dot_expr(a, b) -> "F.Column":
    """Deterministic f64 dot product: elementwise multiply then ordered
    fold (matches a sequential SQL loop / DuckDB list_dot_product).
    `a` is a column name or a Column (e.g. a slice expression)."""
    ca = F.col(a) if isinstance(a, str) else a
    return F.aggregate(
        F.zip_with(ca, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_topk(emb: DataFrame, query_df: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """Exact cosine top-k of `emb` rows against the single-row query_df
    (columns: q array<float>). Returns (vec_id, cos) ordered."""
    j = emb.crossJoin(F.broadcast(query_df))
    return _cosine_topk(j, k, id_col, vec_col)


def _cosine_topk(cand, k: int, id_col: str, vec_col: str):
    """Shared exact-cosine rescoring tail for every ANN variant (brute
    force, IVF ad-hoc, IVF partitioned, LSH bucket): ONE copy of the
    oracle-matched arithmetic — sequential-fold dot, (cos desc, id asc)
    order, round 6 — so a change to any variant cannot silently diverge
    from their common DuckDB oracle. `cand` carries (id_col, vec_col,
    q)."""
    dot = _dot_expr(vec_col, F.col("q"))
    na = F.sqrt(_dot_expr(vec_col, F.col(vec_col)))
    nb = F.sqrt(_dot_expr("q", F.col("q")))
    scored = cand.select(F.col(id_col), (dot / (na * nb)).alias("_cos"))
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


# above this many plan literals (nbits*dim or n_centroids*dim), the
# Catalyst expression path bloats the driver plan / codegen (e.g. dim
# 1536 x nbits 24 = 37k literals) — corpus-side call sites switch to the
# mapInArrow twin; the expression twin stays for oracle-comparable rows
# and single-row query-side signatures
_ARROW_LITERAL_THRESHOLD = 4096


def _list_matrix(b, vec_col: str, dim: int):
    """(X, ok) from an Arrow record batch's list column: X is a
    (n, dim) float64 matrix with invalid rows zero-filled, ok a bool
    mask. A row is invalid when its list is null or its length != dim.
    The expression twins never crash on such rows (a null dot folds to
    bit 0 / a null assignment), so the Arrow twins must not either —
    a bare flatten().reshape() would throw the moment one
    embedding-service failure row reached a batch."""
    import pyarrow as pa

    lst = b.column(vec_col)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    n = len(b)
    lens = np.asarray(lst.value_lengths().fill_null(-1), dtype=np.int64)
    ok = lens == dim
    flat = np.asarray(lst.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    if ok.all():
        X = flat.reshape(n, dim)
    else:
        X = np.zeros((n, dim), dtype=np.float64)
        if ok.any():
            # flatten() drops null slots; offsets follow non-null lengths
            nn = lens >= 0
            offs = np.zeros(n, dtype=np.int64)
            offs[nn] = np.concatenate(([0], np.cumsum(lens[nn])))[:-1]
            idx = offs[ok][:, None] \
                + np.arange(dim, dtype=np.int64)[None, :]
            X[ok] = flat[idx]
    # a null ELEMENT inside a correct-length list arrives as NaN: the
    # expression twins yield a null assignment / zero signature for such
    # rows (null dot), but a NaN row would silently argmin to centroid 0
    # — a data-corruption divergence, so mark it invalid here too
    bad_elem = np.isnan(X).any(axis=1)
    if bad_elem.any():
        ok = ok & ~bad_elem
        X = np.where(ok[:, None], X, 0.0)
    return X, ok


def _id_schema(emb: DataFrame, id_col: str) -> str:
    """The id column's real Spark type for the mapInArrow schema — a
    hardcoded `long` crashes string-id callers only past the literal
    threshold (a dim-dependent behavior cliff)."""
    return emb.schema[id_col].dataType.simpleString()


def signature_arrow(emb: DataFrame, planes: np.ndarray,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    out_col: str = "_sig",
                    keep_cols: tuple = ()) -> DataFrame:
    """mapInArrow twin of signature_expr: ONE (batch x nbits) matmul per
    Arrow batch instead of nbits*dim plan literals. Bit j set iff
    v . plane_j > 0 — identical to the expression path except on exact
    sign-boundary ties (matmul vs sequential fold, last-ulp only).
    Null / wrong-length vectors get signature 0, exactly like the
    expression path (every bit's null comparison folds to 0).
    Returns (id_col, out_col long, *keep_cols)."""
    import pyarrow as pa

    P = np.ascontiguousarray(planes, dtype=np.float64).T  # (dim, nbits)
    nbits = P.shape[1]
    weights = (1 << np.arange(nbits, dtype=np.int64))

    def encode(batches):
        for b in batches:
            X, ok = _list_matrix(b, vec_col, P.shape[0])
            sig = ((X @ P) > 0) @ weights
            sig[~ok] = 0
            cols = [b.column(id_col), pa.array(sig, type=pa.int64())]
            names = [id_col, out_col]
            for kc in keep_cols:
                cols.append(b.column(kc))
                names.append(kc)
            yield pa.record_batch(cols, names=names)

    keep_schema = "".join(
        f", {kc} {emb.schema[kc].dataType.simpleString()}"
        for kc in keep_cols)
    sel = [id_col, vec_col] + [c for c in keep_cols
                               if c not in (id_col, vec_col)]
    return emb.select(*sel).mapInArrow(
        encode,
        f"{id_col} {_id_schema(emb, id_col)}, {out_col} long{keep_schema}")


def ivf_assign_arrow(emb: DataFrame, centroids: np.ndarray,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     out_col: str = "_cid",
                     keep_cols: tuple = ()) -> DataFrame:
    """mapInArrow twin of ivf_assign_expr: one (batch x n_centroids)
    matmul per Arrow batch; np.argmin's first-min tie-break matches the
    expression path's array_position(ds, array_min(ds)). keep_cols may
    include vec_col itself (the IVF layout writers keep the vectors).
    Null / wrong-length vectors get a NULL assignment, exactly like the
    expression path (all-null distance array -> null argmin)."""
    import pyarrow as pa

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    csum = (C ** 2).sum(axis=1)  # (n_centroids,)
    Ct = np.ascontiguousarray(C.T)

    def assign(batches):
        for b in batches:
            X, ok = _list_matrix(b, vec_col, C.shape[1])
            d = csum[None, :] - 2.0 * (X @ Ct)
            cid = d.argmin(axis=1).astype(np.int32)
            cols = [b.column(id_col),
                    pa.array(cid, type=pa.int32(), mask=~ok)]
            names = [id_col, out_col]
            for kc in keep_cols:
                cols.append(b.column(kc))
                names.append(kc)
            yield pa.record_batch(cols, names=names)

    keep_schema = "".join(
        f", {kc} {emb.schema[kc].dataType.simpleString()}"
        for kc in keep_cols)
    sel = [id_col, vec_col] + [c for c in keep_cols
                               if c not in (id_col, vec_col)]
    return emb.select(*sel).mapInArrow(
        assign,
        f"{id_col} {_id_schema(emb, id_col)}, {out_col} int{keep_schema}")


def _with_sig(emb: DataFrame, planes: np.ndarray, vec_col: str,
              id_col: str, out_col: str = "_sig") -> DataFrame:
    """Corpus-side signature with automatic path choice: expression tree
    below _ARROW_LITERAL_THRESHOLD literals (oracle-exact), mapInArrow
    matmul above it (plan stays O(1) at production dims). Keeps every
    input column on BOTH paths — dropping extras only above the
    threshold would be a dim-dependent schema cliff (see _with_cid)."""
    if planes.size > _ARROW_LITERAL_THRESHOLD:
        keep = tuple(c for c in emb.columns if c != id_col)
        return signature_arrow(emb, planes, vec_col, id_col, out_col,
                               keep_cols=keep)
    return emb.withColumn(out_col, signature_expr(vec_col, planes))


def _with_cid(emb: DataFrame, centroids: np.ndarray, vec_col: str,
              id_col: str, out_col: str = "_cid") -> DataFrame:
    """Corpus-side IVF assignment with automatic path choice (see
    _with_sig); keeps every input column either way."""
    if centroids.size > _ARROW_LITERAL_THRESHOLD:
        keep = tuple(c for c in emb.columns if c != id_col)
        return ivf_assign_arrow(emb, centroids, vec_col, id_col, out_col,
                                keep_cols=keep)
    return emb.withColumn(out_col, ivf_assign_expr(vec_col, centroids))


def _corpus_dim(emb: DataFrame, vec_col: str) -> int:
    """Dimensionality probed from the first NON-NULL vector — the
    arbitrary first row may be a null-embedding failure row (len(None)
    on the driver) or ragged (silently mis-sizing every hyperplane)."""
    row = (emb.where(F.col(vec_col).isNotNull())
           .select(vec_col).first())
    if row is None:
        raise ValueError(f"no non-null {vec_col!r} vectors in corpus")
    return len(row[0])


def _driver_sample(emb: DataFrame, vec_col: str, id_col: str,
                   sample: int) -> np.ndarray:
    """Id-ordered driver-side training sample as a dense (n, dim)
    float64 matrix. Null and wrong-length embeddings (the failure rows
    the encode/assign paths are hardened against) are FILTERED, not
    crashed on — training just sees fewer rows."""
    dim = _corpus_dim(emb, vec_col)
    pdf = (emb.where(F.col(vec_col).isNotNull()
                     & (F.size(vec_col) == dim))
           .orderBy(id_col).select(vec_col).limit(sample).toPandas())
    X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
    # null ELEMENTS inside a correct-length list arrive as NaN
    keep = np.isfinite(X).all(axis=1)
    return X[keep]


def train_ivf_centroids(emb: DataFrame, n_centroids: int = 16,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        sample: int = 2048, iters: int = 10,
                        seed: int = 42) -> np.ndarray:
    """Deterministic k-means coarse quantizer trained on a driver-side
    sample (IVF training is always a sampled, driver/parameter-server
    step; assignment is the distributed part). Lloyd's algorithm with
    seeded init over an id-ordered sample; empty clusters re-seeded
    deterministically."""
    X = _driver_sample(emb, vec_col, id_col, sample)
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
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]
    bucketed = _with_cid(emb, centroids, vec_col, id_col)
    cand = bucketed.filter(F.col("_cid").isin(probes)) \
        .crossJoin(F.broadcast(query_df))
    return _cosine_topk(cand, k, id_col, vec_col)


def ivf_partition(emb: DataFrame, out_dir: str, centroids: np.ndarray,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> str:
    """One-time IVF layout write: assign every row to its nearest
    centroid and write the corpus partitioned by the centroid id (ONE
    assignment shuffle, ever). After this, ivf_topk_partitioned reads
    only the nprobe probed partitions — nprobe/n_centroids of the BYTES,
    not just of the compute (the split-pruning idea of
    quickwit-search leaf.rs:697-810 applied to ANN inverted lists).

    Centroids are persisted beside the data so queries don't re-train."""
    import json as _json
    import os as _os
    assigned = _with_cid(emb, centroids, vec_col, id_col)
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
    return _cosine_topk(cand, k, id_col, vec_col)


def train_pq_codebooks(emb: DataFrame, m: int = 4, ksub: int = 16,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       sample: int = 2048, iters: int = 10,
                       seed: int = 42,
                       residual_centroids: np.ndarray | None = None
                       ) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011, public): split
    each vector into m contiguous subspaces and k-means each subspace
    independently on a driver-side sample (training is the sampled,
    parameter-server step; encoding is the distributed part). Returns
    (m, ksub, dim/m) float64 rounded to 6 decimals (literal-embeddable).

    residual_centroids: train on v - nearest_centroid(v) instead of v
    (for residual IVF-PQ layouts — the codebooks then model the
    within-list spread, matching how the layout encodes).
    """
    X = _driver_sample(emb, vec_col, id_col, sample)
    if residual_centroids is not None:
        C = np.asarray(residual_centroids, dtype=np.float64)
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        X = X - C[d.argmin(axis=1)]
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    out = np.empty((m, ksub, dsub), dtype=np.float64)
    for i in range(m):
        Xs = X[:, i * dsub:(i + 1) * dsub]
        cent = Xs[rng.choice(len(Xs), size=min(ksub, len(Xs)),
                             replace=False)]
        for _ in range(iters):
            d = ((Xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(len(cent)):
                msk = assign == c
                cent[c] = Xs[msk].mean(axis=0) if msk.any() \
                    else Xs[rng.integers(0, len(Xs))]
        out[i] = cent
    return np.round(out, 6)


def fixed_pq_codebooks(dim: int, m: int = 4, ksub: int = 8,
                       seed: int = 42) -> np.ndarray:
    """Data-independent seeded codebooks (for oracle-checkable plans and
    cold-start encoding; trained codebooks via train_pq_codebooks).
    Entries are scaled to ~N(0, 1/dim) so centroid norms match
    unit-normalized embeddings (standard-normal entries would have
    subvector norms ~sqrt(dim/m), making the ||c||^2 term dominate the
    assignment and collapsing every vector onto one code)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((m, ksub, dim // m))
                    / np.sqrt(dim), 6)


def pq_encode_expr(vec_col: str, codebooks: np.ndarray):
    """PQ encode as a JVM-side expression: array<int> of per-subspace
    nearest-centroid codes (0-based). Same flat-array argmin / first-min
    tie-break as ivf_assign_expr; ||v_sub||^2 is constant per candidate
    set so distances compare via ||c||^2 - 2 v_sub.c.

    Codegen is O(m * ksub) aggregates — fine at gate scale (m=4,
    ksub=8). For bulk encoding of a 100 TB corpus use pq_encode_arrow
    (one matmul per Arrow batch), which produces identical codes."""
    m, ksub, dsub = codebooks.shape
    codes = []
    for i in range(m):
        vslice = F.slice(F.col(vec_col), i * dsub + 1, dsub)
        dists = []
        for c in codebooks[i]:
            lits = F.array(*[F.lit(float(x)) for x in c])
            dists.append(F.lit(float((c * c).sum()))
                         - F.lit(2.0) * _dot_expr(vslice, lits))
        ds = F.array(*dists)
        codes.append((F.array_position(ds, F.array_min(ds)) - F.lit(1))
                     .cast("int"))
    return F.array(*codes)


def pq_encode_arrow(emb: DataFrame, codebooks: np.ndarray,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    out_col: str = "pq_code",
                    keep_cols: tuple = (),
                    residual_centroids: np.ndarray | None = None,
                    cid_col: str = "_cid") -> DataFrame:
    """Scale-path PQ encoder: mapInArrow batches, one (batch x ksub)
    matmul per subspace — no per-row Python, no shuffle. 100 TB of f32
    embeddings compress to m bytes/vector (dim*4/m x smaller); the codes
    DataFrame is what you persist, the raw vectors go cold.

    Codes are identical to pq_encode_expr's (same first-min argmin);
    only the distance arithmetic differs in the last ulp (matmul vs
    sequential fold), which only matters on exact centroid ties.

    residual_centroids: when given, each row's coarse centroid (row
    `cid_col`, which must be in keep_cols) is subtracted BEFORE encoding
    — classical residual IVF-PQ, better recall at small m because the
    codebooks only have to cover the within-list spread."""
    import pyarrow as pa

    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    csum = (cb ** 2).sum(axis=2)          # (m, ksub)
    cbt = [np.ascontiguousarray(cb[i].T) for i in range(m)]
    RC = None
    if residual_centroids is not None:
        if cid_col not in keep_cols:
            raise ValueError(f"residual encoding needs {cid_col!r} "
                             "in keep_cols")
        RC = np.ascontiguousarray(residual_centroids, dtype=np.float64)

    def encode(batches):
        for b in batches:
            ids = b.column(id_col)
            X, ok = _list_matrix(b, vec_col, m * dsub)
            if RC is not None:
                # a null coarse cid (null embedding upstream) must not
                # index RC — mask the row out instead
                cids = np.asarray(
                    b.column(cid_col).to_numpy(zero_copy_only=False),
                    dtype=np.float64)
                cid_ok = ~np.isnan(cids)
                ok = ok & cid_ok
                safe = np.where(cid_ok, cids, 0).astype(np.int64)
                X = X - RC[safe]
            codes = np.empty((len(b), m), dtype=np.int32)
            for i in range(m):
                Xs = X[:, i * dsub:(i + 1) * dsub]
                d = csum[i][None, :] - 2.0 * (Xs @ cbt[i])
                codes[:, i] = d.argmin(axis=1)
            if ok.all():
                code_arr = pa.array(list(codes), type=pa.list_(pa.int32()))
            else:
                # null/ragged vectors -> null code, like the expr twin
                code_arr = pa.array(
                    [row.tolist() if good else None
                     for row, good in zip(codes, ok)],
                    type=pa.list_(pa.int32()))
            cols = [ids, code_arr]
            names = [id_col, out_col]
            for kc in keep_cols:
                cols.append(b.column(kc))
                names.append(kc)
            yield pa.record_batch(cols, names=names)

    keep_schema = "".join(
        f", {kc} {emb.schema[kc].dataType.simpleString()}"
        for kc in keep_cols)
    return emb.select(id_col, vec_col, *keep_cols).mapInArrow(
        encode,
        f"{id_col} {_id_schema(emb, id_col)}, "
        f"{out_col} array<int>{keep_schema}")


def pq_adc_topk(codes_df: DataFrame, query_df: DataFrame,
                codebooks: np.ndarray, k: int = 10,
                id_col: str = "vec_id", code_col: str = "pq_code"
                ) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query builds an
    (m x ksub) lookup table of subspace dot products; each row's
    approximate cosine is LUT sums indexed by its codes — the scan
    touches only the m-byte codes, never the raw vectors. Shuffle-free
    map + global top-k, like brute_force_topk but over compressed data.

    Score = sum_i dot(q_i, cb[i][code_i]) /
            (||q|| * sqrt(sum_i ||cb[i][code_i]||^2))
    (the standard ADC approximation of cosine; exact re-ranking of the
    short-list against raw vectors composes downstream if needed)."""
    m, ksub, dsub = codebooks.shape
    j = codes_df.crossJoin(F.broadcast(query_df))
    dot_terms = []
    n2_terms = []
    for i in range(m):
        qslice = F.slice(F.col("q"), i * dsub + 1, dsub)
        lut = F.array(*[
            _dot_expr(qslice, F.array(*[F.lit(float(x)) for x in c]))
            for c in codebooks[i]])
        csums = F.array(*[F.lit(float((c * c).sum()))
                          for c in codebooks[i]])
        code_i = F.element_at(F.col(code_col), i + 1) + F.lit(1)
        dot_terms.append(F.element_at(lut, code_i))
        n2_terms.append(F.element_at(csums, code_i))
    adc = dot_terms[0]
    for t in dot_terms[1:]:
        adc = adc + t
    n2 = n2_terms[0]
    for t in n2_terms[1:]:
        n2 = n2 + t
    nb = F.sqrt(_dot_expr("q", F.col("q")))
    # guard the zero denominator (a zero codeword / zero-norm query):
    # ANSI mode would raise DIVIDE_BY_ZERO mid-scan otherwise. Rows with
    # no defined cosine are DROPPED — same contract as adc_topk_arrow,
    # so arrow=True/False return identical rows, not k-padded variants
    denom = F.sqrt(n2) * nb
    scored = j.select(F.col(id_col),
                      F.when(denom > F.lit(0.0),
                             adc / denom).alias("_cos"))
    scored = scored.where(F.col("_cos").isNotNull() & ~F.isnan("_cos"))
    return (scored.orderBy(F.col("_cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, F.round("_cos", 6).alias("approx_cos")))


def ivfpq_partition(emb: DataFrame, out_dir: str, centroids: np.ndarray,
                    codebooks: np.ndarray, vec_col: str = "embedding",
                    id_col: str = "vec_id", residual: bool = False) -> str:
    """IVF-PQ layout: the big-corpus ANN composition. Rows are assigned
    to their nearest coarse centroid (_with_cid auto path), PQ-encoded in
    Arrow batches (one matmul per batch), and written partitioned by
    centroid id — ONE pass, one shuffle-free write. A query then reads
    only the probed partitions' CODES: nprobe/n_centroids of the files
    times dim*4/m compression — at 10^9 vectors that is the difference
    between scanning terabytes of floats and megabytes of codes.

    By default codes quantize the raw vector (not the residual
    v - centroid): the ADC table stays list-independent, so one LUT
    serves every probed partition and the layout is re-probeable
    without re-deriving per-list tables. residual=True encodes
    v - centroid[cid] instead — the classical refinement when recall at
    tiny m matters more than table reuse (the codebooks only cover the
    within-list spread; ivfpq_topk rebuilds one shifted LUT per probed
    list, nprobe tables per query). Train the codebooks with the same
    residual_centroids for best recall."""
    import json as _json
    import os as _os
    assigned = _with_cid(emb, centroids, vec_col, id_col)
    codes = pq_encode_arrow(
        assigned, codebooks, vec_col, id_col, keep_cols=("_cid",),
        residual_centroids=centroids if residual else None)
    codes.write.mode("overwrite").partitionBy("_cid").parquet(out_dir)
    try:  # POSIX/local path; on an object store ship params yourself
        with open(_os.path.join(out_dir, "_ivfpq_params.json"), "w") as f:
            _json.dump({"centroids": centroids.tolist(),
                        "codebooks": codebooks.tolist(),
                        "residual": bool(residual)}, f)
    except OSError:
        pass
    return out_dir


def adc_topk_arrow(codes_df: DataFrame, qv: np.ndarray,
                   codebooks: np.ndarray, k: int = 10,
                   id_col: str = "vec_id", code_col: str = "pq_code",
                   probe_centroids: "dict[int, np.ndarray] | None" = None,
                   cid_col: str = "_cid") -> DataFrame:
    """mapInArrow twin of pq_adc_topk: the ADC lookup tables are computed
    ONCE driver-side in numpy and closed over, instead of being built as
    m*ksub*dsub literal expressions through py4j (at nprobe 16 x m 8 x
    ksub 16 the expression path spends ~80 s of pure DRIVER time building
    the plan — measured; the scan itself takes seconds). Each batch is a
    fancy-indexed LUT gather + one per-batch top-k, so only k rows per
    batch reach the final global top-k.

    probe_centroids: {cid: coarse centroid} for residual layouts — rows
    are scored with that list's SHIFTED codebooks (cb + centroid slice),
    selected per row from cid_col. Rows with a cid outside the map (or a
    null/ragged code list) are skipped, mirroring the expression path's
    null-fold. Score/tie semantics match pq_adc_topk: order by the
    unrounded cosine desc then id asc, round(6) on output."""
    import pyarrow as pa

    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    q = np.ascontiguousarray(qv, dtype=np.float64)
    qn = float(np.sqrt(q @ q))
    qs = q.reshape(m, dsub)
    if probe_centroids is None:
        lut_dot = np.einsum("id,ikd->ik", qs, cb)          # (m, ksub)
        lut_n2 = (cb ** 2).sum(axis=2)                     # (m, ksub)
        cid_map = None
    else:
        cids = sorted(probe_centroids)
        cid_map = {c: i for i, c in enumerate(cids)}
        C = np.stack([np.asarray(probe_centroids[c], dtype=np.float64)
                      for c in cids]).reshape(len(cids), m, dsub)
        shifted = cb[None, :, :, :] + C[:, :, None, :]     # (p, m, ksub, d)
        lut_dot = np.einsum("id,pikd->pik", qs, shifted)
        lut_n2 = (shifted ** 2).sum(axis=3)                # (p, m, ksub)
    isub = np.arange(m)

    def score(batches):
        for b in batches:
            ids = b.column(id_col)
            X, ok = _list_matrix(b, code_col, m)
            codes = X.astype(np.int64)
            ok = ok & ((codes >= 0) & (codes < ksub)).all(axis=1)
            codes = np.where(ok[:, None], codes, 0)
            if cid_map is None:
                dot = lut_dot[isub[None, :], codes].sum(axis=1)
                n2 = lut_n2[isub[None, :], codes].sum(axis=1)
            else:
                raw = np.asarray(b.column(cid_col).to_numpy(
                    zero_copy_only=False), dtype=np.float64)
                pidx = np.array([cid_map.get(int(c), -1)
                                 if not np.isnan(c) else -1 for c in raw],
                                dtype=np.int64)
                ok = ok & (pidx >= 0)
                pidx = np.where(pidx >= 0, pidx, 0)
                dot = lut_dot[pidx[:, None], isub[None, :], codes
                              ].sum(axis=1)
                n2 = lut_n2[pidx[:, None], isub[None, :], codes
                            ].sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / (np.sqrt(n2) * qn)
            cos = np.where(ok & np.isfinite(cos), cos, -np.inf)
            n = len(cos)
            # kk counts FINITE scores, not ok rows: an ok row can still
            # fold to -inf (n2 == 0 from a zero/cancelling codebook
            # entry), and sizing the cut by ok.sum() would make kth
            # -inf and leak -Infinity rows into the output when a batch
            # has fewer than k finite rows. Rows with no defined cosine
            # are DROPPED — pq_adc_topk filters them identically
            finite = np.isfinite(cos)
            if not n or not finite.any():
                continue
            # per-batch prune under the global order (cos desc, id asc):
            # keep the top k plus every boundary tie
            kk = min(k, int(finite.sum()))
            kth = np.partition(cos, n - kk)[n - kk]
            keep = np.nonzero(finite & (cos >= kth))[0]
            id_np = np.asarray(ids.to_numpy(zero_copy_only=False))
            order = sorted(keep.tolist(),
                           key=lambda i: (-cos[i], id_np[i]))[:k]
            yield pa.record_batch(
                [ids.take(pa.array(order, type=pa.int32())),
                 pa.array([float(cos[i]) for i in order],
                          type=pa.float64())],
                names=[id_col, "_cos"])

    sel = [id_col, code_col] + ([cid_col] if cid_map is not None else [])
    scored = codes_df.select(*sel).mapInArrow(
        score, f"{id_col} {_id_schema(codes_df, id_col)}, _cos double")
    return (scored.orderBy(F.col("_cos").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, F.round("_cos", 6).alias("approx_cos")))


def ivfpq_topk(spark, layout_dir: str, query_df: DataFrame, k: int = 10,
               nprobe: int = 2, id_col: str = "vec_id",
               centroids: np.ndarray | None = None,
               codebooks: np.ndarray | None = None,
               residual: bool | None = None,
               arrow: bool | None = None) -> DataFrame:
    """ANN over an ivfpq_partition layout: probe the nprobe nearest
    coarse lists (partition filter — directory-level pruning, check
    .explain() for PartitionFilters), ADC-score their codes. Identical
    to pq_adc_topk restricted to the probed lists' rows.

    Residual layouts (auto-detected from the layout params): a residual
    code reconstructs v̂ = c_p + codeword, and since the subspaces are
    disjoint, ADC over list p is EXACTLY plain ADC with the codebooks
    shifted by that list's centroid (cb'[i] = cb[i] + c_p,i) — one
    shifted LUT per probed list, merged by a final top-k.

    arrow (default: auto by plan-literal weight, like _with_sig): the
    expression path builds (nprobe if residual else 1) * m * ksub * dsub
    literals through py4j — above _ARROW_LITERAL_THRESHOLD that is tens
    of seconds of pure driver time per query, so production configs
    dispatch to adc_topk_arrow (ONE scan of the probed partitions, LUTs
    computed driver-side in numpy). The expression path stays for
    small/oracle-comparable configs."""
    import json as _json
    import os as _os
    if centroids is None or codebooks is None or residual is None:
        with open(_os.path.join(layout_dir, "_ivfpq_params.json")) as f:
            params = _json.load(f)
        if centroids is None:
            centroids = np.asarray(params["centroids"], dtype=np.float64)
        if codebooks is None:
            codebooks = np.asarray(params["codebooks"], dtype=np.float64)
        if residual is None:
            residual = bool(params.get("residual", False))
    qv = np.asarray(query_df.first()["q"], dtype=np.float64)
    d2 = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]
    m, ksub, dsub = codebooks.shape
    if arrow is None:
        weight = (nprobe if residual else 1) * m * ksub * dsub
        arrow = weight > _ARROW_LITERAL_THRESHOLD
    scan = (spark.read.parquet(layout_dir)
            .filter(F.col("_cid").isin(probes)))
    if arrow:
        pc = ({p: centroids[p] for p in probes} if residual else None)
        return adc_topk_arrow(scan, qv, codebooks, k, id_col=id_col,
                              probe_centroids=pc)
    if not residual:
        return pq_adc_topk(scan, query_df, codebooks, k, id_col=id_col)
    parts = []
    for p in probes:
        scan_p = (spark.read.parquet(layout_dir)
                  .filter(F.col("_cid") == p))
        cb_p = codebooks + centroids[p].reshape(m, 1, dsub)
        parts.append(pq_adc_topk(scan_p, query_df, cb_p, k,
                                 id_col=id_col))
    out = parts[0]
    for df in parts[1:]:
        out = out.unionAll(df)
    return (out.orderBy(F.col("approx_cos").desc(), F.col(id_col).asc())
            .limit(k))


def lsh_bucket_topk(emb: DataFrame, query_df: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    nbits: int = 8, seed: int = 42) -> DataFrame:
    """ANN: restrict the exact cosine scan to the query's LSH bucket."""
    dim = _corpus_dim(emb, vec_col)
    planes = hyperplanes(dim, nbits, seed)
    bucketed = _with_sig(emb, planes, vec_col, id_col)
    qb = query_df.withColumn("_qsig", signature_expr("q", planes))
    cand = bucketed.join(F.broadcast(qb),
                         F.col("_sig") == F.col("_qsig"))
    return _cosine_topk(cand, k, id_col, vec_col)
