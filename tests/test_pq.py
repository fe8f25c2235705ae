"""Product-quantization ANN tests: bulk Arrow encoder vs expression
encoder parity, trained-codebook recall against brute force, and the
codes-only property of the ADC scan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.pipeline.similarity import (
    brute_force_topk,
    fixed_pq_codebooks,
    pq_adc_topk,
    pq_encode_arrow,
    pq_encode_expr,
    train_pq_codebooks,
)

DIM = 32


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    # 6 well-separated cluster centers + small noise, unit-normalized —
    # the regime PQ is meant for
    centers = rng.standard_normal((6, DIM))
    X = centers[np.arange(600) % 6] + 0.15 * rng.standard_normal((600, DIM))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in X[i]]) for i in range(600)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_arrow_encoder_matches_expr_encoder(spark, emb):
    cb = fixed_pq_codebooks(DIM, m=4, ksub=8, seed=3)
    via_expr = (emb.select("vec_id",
                           pq_encode_expr("embedding", cb).alias("pq_code"))
                .toPandas().set_index("vec_id"))
    via_arrow = (pq_encode_arrow(emb, cb)
                 .toPandas().set_index("vec_id"))
    assert len(via_expr) == len(via_arrow) == 600
    for vid in via_expr.index:
        assert list(via_expr.loc[vid, "pq_code"]) == \
            list(via_arrow.loc[vid, "pq_code"]), vid


def test_trained_pq_recall_vs_brute_force(spark, emb):
    cb = train_pq_codebooks(emb, m=8, ksub=16, sample=600, seed=11)
    codes = pq_encode_arrow(emb, cb)
    qdf = (emb.filter(F.col("vec_id") == 7)
           .select(F.col("embedding").alias("q")))
    exact = set(brute_force_topk(emb, qdf, k=10).toPandas()["vec_id"])
    approx = set(pq_adc_topk(codes, qdf, cb, k=30).toPandas()["vec_id"])
    # trained PQ at 16x compression keeps most of the true top-10 in its
    # top-30 shortlist (exact re-rank of the shortlist then recovers
    # the rest); fixed random codebooks would not pass this bar
    assert len(exact & approx) >= 7


def test_adc_scans_codes_only(spark, emb):
    """The ADC plan must not reference the embedding column: rank from
    an m-byte code per row (the 100 TB point of PQ)."""
    cb = fixed_pq_codebooks(DIM, m=4, ksub=8, seed=3)
    codes = pq_encode_arrow(emb, cb).select("vec_id", "pq_code")
    qdf = (emb.filter(F.col("vec_id") == 0)
           .select(F.col("embedding").alias("q")))
    plan = pq_adc_topk(codes, qdf, cb, k=5)
    explained = plan._jdf.queryExecution().optimizedPlan().toString()
    assert "pq_code" in explained
    rows = plan.toPandas()
    assert len(rows) == 5
    scores = list(rows["approx_cos"])
    assert scores == sorted(scores, reverse=True)
    assert all(-1.5 <= s <= 1.5 for s in scores)


def test_pq_code_width(spark, emb):
    cb = fixed_pq_codebooks(DIM, m=8, ksub=4, seed=2)
    out = pq_encode_arrow(emb, cb).toPandas()
    assert all(len(c) == 8 for c in out["pq_code"])
    assert all(0 <= v < 4 for c in out["pq_code"] for v in c)


def test_ivfpq_layout_and_query(spark, emb, tmp_path):
    """IVF-PQ: partitioned code layout, probed-list ADC equals plain PQ
    ADC restricted to the probed lists; scan plan prunes partitions."""
    from quickwit_spark.pipeline.similarity import (
        ivf_assign_expr,
        ivfpq_partition,
        ivfpq_topk,
        train_ivf_centroids,
    )
    cents = train_ivf_centroids(emb, n_centroids=6, sample=600, seed=3)
    cb = train_pq_codebooks(emb, m=8, ksub=16, sample=600, seed=11)
    layout = str(tmp_path / "ivfpq")
    ivfpq_partition(emb, layout, cents, cb)
    qdf = (emb.filter(F.col("vec_id") == 7)
           .select(F.col("embedding").alias("q")))
    got = ivfpq_topk(spark, layout, qdf, k=10, nprobe=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_cid" in plan
    got_pd = got.toPandas()

    # oracle: same probes computed by hand, plain PQ ADC over that subset
    import numpy as np
    qv = np.asarray(qdf.first()["q"], dtype=np.float64)
    d2 = ((cents - qv[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:2]]
    subset = emb.withColumn("_cid", ivf_assign_expr("embedding", cents)) \
        .filter(F.col("_cid").isin(probes))
    codes = pq_encode_arrow(subset, cb)
    want_pd = pq_adc_topk(codes, qdf, cb, k=10).toPandas()
    assert list(got_pd["vec_id"]) == list(want_pd["vec_id"])
    assert list(got_pd["approx_cos"]) == list(want_pd["approx_cos"])


def test_ivfpq_params_roundtrip(spark, emb, tmp_path):
    from quickwit_spark.pipeline.similarity import (
        ivfpq_partition,
        ivfpq_topk,
        train_ivf_centroids,
    )
    cents = train_ivf_centroids(emb, n_centroids=4, sample=600, seed=5)
    cb = fixed_pq_codebooks(DIM, m=4, ksub=8, seed=3)
    layout = str(tmp_path / "ivfpq2")
    ivfpq_partition(emb, layout, cents, cb)
    qdf = (emb.filter(F.col("vec_id") == 0)
           .select(F.col("embedding").alias("q")))
    # params loaded from the layout (no explicit centroids/codebooks)
    a = ivfpq_topk(spark, layout, qdf, k=5, nprobe=1).toPandas()
    b = ivfpq_topk(spark, layout, qdf, k=5, nprobe=1,
                   centroids=cents, codebooks=cb).toPandas()
    assert list(a["vec_id"]) == list(b["vec_id"])


def test_arrow_twins_match_expression_paths(spark):
    """signature_arrow / ivf_assign_arrow must agree with the Catalyst
    expression twins at production dims (768-dim, nbits 20, 64
    centroids) — the expression path is the oracle, the Arrow path is
    what corpus-side call sites use above _ARROW_LITERAL_THRESHOLD."""
    import numpy as np
    from pyspark.sql import functions as F
    from quickwit_spark.pipeline.similarity import (
        _ARROW_LITERAL_THRESHOLD, hyperplanes, ivf_assign_arrow,
        ivf_assign_expr, signature_arrow, signature_expr)

    dim, nbits, ncent, n = 768, 20, 64, 300
    rng = np.random.default_rng(99)
    rows = [(i, rng.standard_normal(dim).astype(np.float32).tolist())
            for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    planes = hyperplanes(dim, nbits, seed=7)
    assert planes.size > _ARROW_LITERAL_THRESHOLD  # arrow territory
    want_sig = {r["vec_id"]: r["s"] for r in emb.withColumn(
        "s", signature_expr("embedding", planes)).select(
        "vec_id", "s").collect()}
    got_sig = {r["vec_id"]: r["_sig"] for r in
               signature_arrow(emb, planes).collect()}
    assert got_sig == want_sig

    cents = rng.standard_normal((ncent, dim)).round(4)
    assert cents.size > _ARROW_LITERAL_THRESHOLD
    want_cid = {r["vec_id"]: r["c"] for r in emb.withColumn(
        "c", ivf_assign_expr("embedding", cents)).select(
        "vec_id", "c").collect()}
    got = ivf_assign_arrow(emb, cents, keep_cols=("embedding",)).collect()
    assert {r["vec_id"]: r["_cid"] for r in got} == want_cid
    assert len(got[0]["embedding"]) == dim  # keep_cols carries vectors


def test_residual_ivfpq_recall_beats_plain(spark, tmp_path):
    """Residual IVF-PQ (codes quantize v - centroid) must beat the
    list-independent layout at the same tiny m when the inverted lists
    outnumber ksub — plain codebooks then can't cover the coarse
    centers (8 centroids per subspace vs 40 list centers), while
    residual codebooks only cover the within-list spread. Measured on
    this corpus: reconstruction error 0.18 vs 0.69. The residual query
    path builds one shifted LUT per probed list and stays
    partition-pruned."""
    from quickwit_spark.pipeline.similarity import (
        ivfpq_partition, ivfpq_topk, train_ivf_centroids)

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((40, DIM))
    X = centers[np.arange(600) % 40] \
        + 0.05 * rng.standard_normal((600, DIM))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    emb40 = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(600)],
        "vec_id long, embedding array<float>")

    cents = train_ivf_centroids(emb40, n_centroids=40, sample=600, seed=4)
    qdf = (emb40.filter(F.col("vec_id") == 7)
           .select(F.col("embedding").alias("q")))
    exact10 = set(brute_force_topk(emb40, qdf, k=10).toPandas()["vec_id"])

    r10, r30 = {}, {}
    for residual in (False, True):
        cb = train_pq_codebooks(
            emb40, m=4, ksub=8, sample=600, seed=11,
            residual_centroids=cents if residual else None)
        d = str(tmp_path / ("res" if residual else "plain"))
        ivfpq_partition(emb40, d, cents, cb, residual=residual)
        got30 = ivfpq_topk(spark, d, qdf, k=30, nprobe=3).toPandas()
        r30[residual] = len(exact10 & set(got30["vec_id"]))
        r10[residual] = len(exact10 & set(got30["vec_id"][:10]))
    assert r10[True] >= r10[False]      # residual at least as sharp
    assert r30[True] == 10              # full true top-10 in shortlist
    assert r10[True] >= 7


def test_arrow_twins_tolerate_null_and_ragged_vectors(spark):
    """A corpus with null embeddings (an embedding-service failure mode)
    or wrong-length vectors must not abort the Arrow twins: nulls /
    ragged rows get sig 0 and a NULL cid, exactly like the expression
    paths — previously flatten().reshape() raised inside the UDF and
    killed the whole job. String ids must also survive (the output
    schema carries the id column's real type, not a hardcoded long)."""
    from quickwit_spark.pipeline.similarity import (
        hyperplanes, ivf_assign_arrow, ivf_assign_expr, pq_encode_arrow,
        fixed_pq_codebooks, signature_arrow, signature_expr)

    dim = 16
    rng = np.random.default_rng(3)
    rows = []
    for i in range(40):
        if i % 13 == 5:
            v = None                                  # null embedding
        elif i % 13 == 9:
            v = rng.standard_normal(dim - 3).tolist()  # ragged
        else:
            v = rng.standard_normal(dim).tolist()
        rows.append((f"doc-{i:03d}", v))
    emb = spark.createDataFrame(rows,
                                "vec_id string, embedding array<float>")

    planes = hyperplanes(dim, nbits=6, seed=1)
    want = {r["vec_id"]: r["s"] for r in emb.withColumn(
        "s", signature_expr("embedding", planes).cast("long")).select(
        "vec_id", "s").collect()}
    got = {r["vec_id"]: r["_sig"]
           for r in signature_arrow(emb, planes).collect()}
    assert got == want
    assert got["doc-005"] == 0  # null folds to bit-pattern 0

    cents = rng.standard_normal((4, dim)).round(4)
    want_cid = {r["vec_id"]: r["c"] for r in emb.withColumn(
        "c", ivf_assign_expr("embedding", cents)).select(
        "vec_id", "c").collect()}
    got_cid = {r["vec_id"]: r["_cid"]
               for r in ivf_assign_arrow(emb, cents).collect()}
    assert got_cid == want_cid
    assert got_cid["doc-005"] is None and got_cid["doc-009"] is None

    cb = fixed_pq_codebooks(dim, m=4, ksub=8, seed=3)
    codes = {r["vec_id"]: r["pq_code"]
             for r in pq_encode_arrow(emb, cb).collect()}
    assert codes["doc-005"] is None and codes["doc-009"] is None
    assert len(codes["doc-000"]) == 4


def test_adc_arrow_never_emits_minus_inf_rows(spark):
    """An ok row can still fold to -inf (a zero codebook centroid makes
    n2 == 0 -> cos = inf -> folded). When a batch holds fewer than k
    finite rows, the kth cut must be sized by FINITE scores — otherwise
    kth becomes -inf and -Infinity rows leak into the top-k, where the
    expression path ranks them below every finite score."""
    import numpy as np
    from quickwit_spark.pipeline.similarity import adc_topk_arrow

    dsub = 4
    cb = np.zeros((1, 2, dsub))
    cb[0, 1] = 1.0  # code 1 is finite, code 0 scores 0/0
    rows = [(0, [0]), (1, [0]), (2, [1]), (3, [0])]
    codes = spark.createDataFrame(rows, "vec_id long, pq_code array<int>")
    qv = np.ones(dsub)
    out = adc_topk_arrow(codes, qv, cb, k=3).collect()
    assert [r["vec_id"] for r in out] == [2]
    assert all(np.isfinite(r["approx_cos"]) for r in out)

    # all rows non-finite: empty result, no crash
    rows0 = [(0, [0]), (1, [0])]
    codes0 = spark.createDataFrame(rows0, "vec_id long, pq_code array<int>")
    assert adc_topk_arrow(codes0, qv, cb, k=2).collect() == []
