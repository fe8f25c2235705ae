"""Aggregations over query-matched documents — ES-style spec -> DataFrame.

Mirrors the reference's aggregation surface (SURVEY.md §2.6;
quickwit-query/src/aggregations.rs:85-172, docs/reference/aggregation.md):
metrics (avg/count/min/max/sum/stats/percentiles/cardinality) and buckets
(terms, histogram, date_histogram, range), with one level of
sub-aggregation nesting. Execution model matches the reference's
partial->final merge (collector.rs:565-911): the leaf filter runs
per-segment inside `IndexSearcher.matched_docs`, and Catalyst's
partial/final aggregation performs the merge when the returned plan runs.

    spec = {"langs": {"terms": {"field": "lang"},
                      "aggs": {"chars": {"avg": {"field": "n_chars"}}}}}
    df = aggregate(searcher, "text:merge", spec)
"""

from __future__ import annotations

from pyspark.sql import functions as F

_METRICS = ("avg", "min", "max", "sum", "value_count", "cardinality",
            "stats", "percentiles")


def _metric_exprs(name: str, kind: str, body: dict) -> list:
    field = body["field"]
    if kind == "avg":
        return [F.avg(field).alias(name)]
    if kind == "min":
        return [F.min(field).alias(name)]
    if kind == "max":
        return [F.max(field).alias(name)]
    if kind == "sum":
        return [F.sum(field).alias(name)]
    if kind == "value_count":
        return [F.count(field).alias(name)]
    if kind == "cardinality":
        # approx by default, like the reference (approx-distinct sketch)
        return [F.approx_count_distinct(field).alias(name)]
    if kind == "stats":
        return [F.count(field).alias(f"{name}_count"),
                F.min(field).alias(f"{name}_min"),
                F.max(field).alias(f"{name}_max"),
                F.avg(field).alias(f"{name}_avg"),
                F.sum(field).alias(f"{name}_sum")]
    if kind == "percentiles":
        pcts = body.get("percents", [1, 5, 25, 50, 75, 95, 99])
        return [F.expr(f"percentile({field}, {p / 100.0})")
                .alias(f"{name}_p{str(p).replace('.', '_')}")
                for p in pcts]
    raise ValueError(f"unsupported metric {kind}")


def _bucket_col(kind: str, body: dict):
    field = body["field"]
    if kind == "terms":
        return F.col(field)
    if kind == "histogram":
        interval = float(body["interval"])
        offset = float(body.get("offset", 0.0))
        return (F.floor((F.col(field) - F.lit(offset)) / F.lit(interval))
                * F.lit(interval) + F.lit(offset))
    if kind == "date_histogram":
        unit = body.get("calendar_interval", body.get("fixed_interval",
                                                      "day"))
        return F.date_trunc(str(unit), F.col(field))
    if kind == "range":
        ranges = body["ranges"]
        expr = None
        for r in ranges:
            lo, hi = r.get("from"), r.get("to")
            label = r.get("key") or f"{lo if lo is not None else '*'}-" \
                                    f"{hi if hi is not None else '*'}"
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col(field) >= F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(field) < F.lit(hi))
            expr = F.when(cond, F.lit(label)) if expr is None else \
                expr.when(cond, F.lit(label))
        return expr
    raise ValueError(f"unsupported bucket {kind}")


def _collect_fields(spec: dict) -> set[str]:
    out: set[str] = set()
    for _name, body in spec.items():
        sub = dict(body)
        nested = sub.pop("aggs", None)
        for kind, kb in sub.items():
            out.add(kb["field"])
        if nested:
            out |= _collect_fields(nested)
    return out


def aggregate(searcher, query, spec: dict):
    """Run an ES-style aggregation spec over the docs matching `query`.

    Returns a Spark DataFrame (when the searcher has a session) or pandas
    DataFrame; one row per bucket for bucket aggs, one row for pure
    metric specs. One nesting level (`aggs` inside a bucket) is supported.
    """
    fields = sorted(_collect_fields(spec))
    matched = searcher.matched_docs(query, fields)
    is_spark = not hasattr(matched, "iloc")
    if not is_spark:
        import pandas as pd
        spark = searcher.spark
        if spark is None:
            raise ValueError("aggregate() needs a SparkSession attached "
                             "to the searcher (IndexSearcher(dir, spark))")
        matched = spark.createDataFrame(matched)

    bucket_aggs = {n: b for n, b in spec.items()
                   if any(k not in _METRICS and k != "aggs" for k in b)}
    metric_aggs = {n: b for n, b in spec.items() if n not in bucket_aggs}

    exprs = [F.count(F.lit(1)).alias("doc_count")]
    for name, body in metric_aggs.items():
        for kind, kb in body.items():
            if kind == "aggs":
                continue
            exprs.extend(_metric_exprs(name, kind, kb))

    if not bucket_aggs:
        return matched.agg(*exprs)
    if len(bucket_aggs) > 1:
        raise ValueError("one bucket aggregation per spec level")
    (name, body), = bucket_aggs.items()
    sub = body.get("aggs", {})
    for sname, sbody in sub.items():
        for kind, kb in sbody.items():
            exprs.extend(_metric_exprs(sname, kind, kb))
    (kind, kb), = ((k, v) for k, v in body.items() if k != "aggs")
    out = (matched.withColumn(name, _bucket_col(kind, kb))
           .groupBy(name).agg(*exprs))
    size = kb.get("size")
    if kind == "terms":
        out = out.orderBy(F.col("doc_count").desc(), F.col(name).asc())
        if size:
            out = out.limit(int(size))
    else:
        out = out.orderBy(F.col(name).asc())
    return out
