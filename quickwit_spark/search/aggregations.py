"""Aggregations over query-matched documents — ES-style spec -> DataFrame.

Mirrors the reference's aggregation surface (SURVEY.md §2.6;
quickwit-query/src/aggregations.rs:85-172, docs/reference/aggregation.md):
metrics (avg/count/min/max/sum/stats/extended_stats/percentiles/
cardinality) and buckets (terms, histogram, date_histogram, range), with
ARBITRARY bucket-in-bucket nesting depth (collector.rs:565-911 allows the
same). Execution model matches the reference's partial->final merge: the
leaf filter runs per-segment inside `IndexSearcher.matched_docs`, and
Catalyst's partial/final aggregation performs the merge when the returned
plan runs.

Output shape: a FLAT DataFrame, one row per deepest bucket combination,
with one column per bucket level (named after the agg name) plus
`doc_count` and the leaf metrics. Metric sub-aggs are supported at the
deepest level (an intermediate-level metric raises — flat rows cannot
carry two granularities).

Extras vs round 1:
  - terms:      size + `sum_other_doc_count` column (total matched docs
                falling outside the returned buckets — the ES response
                field, computed windowed over the small bucket frame);
  - histogram:  `min_doc_count` (default 1 = non-empty buckets; 0 fills
                gaps between the data min/max) and `extended_bounds`
                {min,max} widening the filled key range;
  - extended_stats: sum_of_squares, variance (population), std_deviation.

    spec = {"langs": {"terms": {"field": "lang"},
                      "aggs": {"chars": {"avg": {"field": "n_chars"}}}}}
    df = aggregate(searcher, "text:merge", spec)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

_METRICS = ("avg", "min", "max", "sum", "value_count", "cardinality",
            "stats", "extended_stats", "percentiles", "top_hits")
_BUCKETS = ("terms", "histogram", "date_histogram", "range")


class InvalidAggregation(ValueError):
    """Malformed aggregation spec (unknown kind, bad nesting...) — the
    reference rejects these at deserialization (aggregations.rs)."""



def _fcol(field: str):
    """Column ref for a (possibly dotted) FLAT column name: dynamic
    paths like `actor.login` are single columns, not struct access —
    backtick-escape so Catalyst resolves them literally."""
    return F.col(f"`{field}`") if "." in str(field) else F.col(field)

def _metric_exprs(name: str, kind: str, body: dict) -> list:
    field = body["field"]
    if kind == "avg":
        return [F.avg(_fcol(field)).alias(name)]
    if kind == "min":
        return [F.min(_fcol(field)).alias(name)]
    if kind == "max":
        return [F.max(_fcol(field)).alias(name)]
    if kind == "sum":
        return [F.sum(_fcol(field)).alias(name)]
    if kind == "value_count":
        return [F.count(_fcol(field)).alias(name)]
    if kind == "cardinality":
        # approx by default, like the reference (approx-distinct
        # sketch). rsd 0.01 ~= ES's default precision_threshold
        # behavior: effectively exact at small cardinalities (Spark's
        # default 0.05 miscounts even single-digit sets), still a
        # bounded-memory mergeable sketch at scale
        return [F.approx_count_distinct(_fcol(field), 0.01)
                .alias(name)]
    if kind == "stats":
        return [F.count(_fcol(field)).alias(f"{name}_count"),
                F.min(_fcol(field)).alias(f"{name}_min"),
                F.max(_fcol(field)).alias(f"{name}_max"),
                F.avg(_fcol(field)).alias(f"{name}_avg"),
                F.sum(_fcol(field)).alias(f"{name}_sum")]
    if kind == "extended_stats":
        # population variance, ES-style: sumsq/n - mean^2. The naive
        # formula is cancellation-prone — large values with tiny spread
        # can yield a slightly NEGATIVE double (and NaN std) — so clamp
        # at 0 like ES does
        c = F.count(_fcol(field)).cast("double")
        sumsq = F.sum(_fcol(field).cast("double")
                      * _fcol(field).cast("double"))
        var = F.greatest(sumsq / c - (F.avg(_fcol(field)) * F.avg(_fcol(field))),
                         F.lit(0.0))
        return [F.count(_fcol(field)).alias(f"{name}_count"),
                F.min(_fcol(field)).alias(f"{name}_min"),
                F.max(_fcol(field)).alias(f"{name}_max"),
                F.avg(_fcol(field)).alias(f"{name}_avg"),
                F.sum(_fcol(field)).alias(f"{name}_sum"),
                sumsq.alias(f"{name}_sum_of_squares"),
                var.alias(f"{name}_variance"),
                F.sqrt(var).alias(f"{name}_std_deviation")]
    if kind == "percentiles":
        pcts = body.get("percents", [1, 5, 25, 50, 75, 95, 99])
        if body.get("approx"):
            # sketch path (the reference always sketches — tantivy
            # percentiles use a t-digest-family structure): Spark's
            # percentile_approx is a mergeable partial/final sketch
            # with bounded memory, vs exact percentile() which sorts
            # every group's values. At 100 TB use approx: true.
            acc = int(body.get("accuracy", 10000))
            return [F.percentile_approx(_fcol(field), p / 100.0, acc).cast("double")
                    .alias(f"{name}_p{str(p).replace('.', '_')}")
                    for p in pcts]
        return [F.expr(f"percentile(`{field}`, {p / 100.0})")
                .alias(f"{name}_p{str(p).replace('.', '_')}")
                for p in pcts]
    raise InvalidAggregation(f"unsupported metric {kind}")


def _terms_order(body: dict) -> tuple[str, str]:
    """Parse a terms-agg `order` spec into (target, direction).

    ES/tantivy forms: {"_count": "desc"} | {"_key": "asc"} |
    {"<metric>[.<sub>]": dir} | a one-element list of those (ES accepts
    a list; tantivy — and therefore the reference — takes one
    criterion). Default: _count desc."""
    ospec = body.get("order")
    if not ospec:
        return "_count", "desc"
    if isinstance(ospec, list):
        if len(ospec) != 1:
            raise InvalidAggregation(
                "terms order: exactly one criterion is supported "
                "(tantivy CustomOrder is a single target)")
        ospec = ospec[0]
    if not isinstance(ospec, dict) or len(ospec) != 1:
        raise InvalidAggregation(f"bad terms order spec {ospec!r}")
    (target, direction), = ospec.items()
    if direction not in ("asc", "desc"):
        raise InvalidAggregation(
            f"terms order direction must be asc|desc, got {direction!r}")
    return target, direction


def _range_label(r: dict) -> str:
    """One range bucket's label — shared by the bucket expression and
    the gap-fill join so the formats cannot drift."""
    lo, hi = r.get("from"), r.get("to")
    return r.get("key") or (f"{lo if lo is not None else '*'}-"
                            f"{hi if hi is not None else '*'}")


def _parse_duration_ms(s) -> int:
    """ES duration ("30d", "-4d", "90s", "250ms") -> millis (signed:
    date_histogram `offset` accepts a leading -)."""
    import re as _re
    m = _re.fullmatch(r"(-?)(\d+)(ms|s|m|h|d)", str(s).strip())
    if not m:
        raise InvalidAggregation(
            f"bad duration {s!r} (expected e.g. '30d', '-4d', '90s')")
    mult = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
            "d": 86_400_000}[m.group(3)]
    v = int(m.group(2)) * mult
    return -v if m.group(1) else v


def _bucket_col(kind: str, body: dict, field_is_millis: bool = False):
    field = body["field"]
    if kind == "terms":
        return _fcol(field)
    if kind == "histogram":
        interval = float(body["interval"])
        offset = float(body.get("offset", 0.0))
        return (F.floor((_fcol(field) - F.lit(offset)) / F.lit(interval))
                * F.lit(interval) + F.lit(offset))
    if kind == "date_histogram":
        fixed = body.get("fixed_interval")
        if field_is_millis:
            # datetime fast fields store epoch millis i64 (the
            # doc-mapper layout): truncate arithmetically, honoring the
            # ES `offset` duration — key stays an epoch-millis long
            if fixed is None:
                raise InvalidAggregation(
                    "date_histogram over an epoch-millis field needs "
                    "fixed_interval")
            step = _parse_duration_ms(fixed)
            if step <= 0:
                raise InvalidAggregation(
                    f"fixed_interval must be positive, got {fixed!r}")
            off = _parse_duration_ms(body["offset"]) \
                if "offset" in body else 0
            return (F.floor((_fcol(field) - F.lit(off)) / F.lit(step))
                    * F.lit(step) + F.lit(off))
        if fixed is not None:
            # ES fixed_interval: "<n>(ms|s|m|h|d)" — truncate to epoch
            # multiples (aggregation.md fixed_interval)
            import re as _re
            m = _re.fullmatch(r"(\d+)(ms|s|m|h|d)", str(fixed))
            if not m:
                raise InvalidAggregation(
                    f"bad fixed_interval {fixed!r} (expected e.g. "
                    "'30s', '5m', '1h')")
            mult = {"ms": 0.001, "s": 1, "m": 60, "h": 3600,
                    "d": 86400}[m.group(2)]
            step = int(m.group(1)) * mult
            if step <= 0 or step != int(step):
                raise InvalidAggregation(
                    f"fixed_interval {fixed!r} must be a whole number "
                    "of seconds")
            step = int(step)
            return F.timestamp_seconds(
                F.floor(F.unix_timestamp(_fcol(field)) / F.lit(step))
                * F.lit(step))
        unit = body.get("calendar_interval", "day")
        return F.date_trunc(str(unit), _fcol(field))
    if kind == "range":
        ranges = body["ranges"]
        expr = None  # labels via _range_label — the ONE formatter shared
        # with the gap-fill join, so the two can never drift apart
        for r in ranges:
            lo, hi = r.get("from"), r.get("to")
            label = _range_label(r)
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (_fcol(field) >= F.lit(lo))
            if hi is not None:
                cond = cond & (_fcol(field) < F.lit(hi))
            expr = F.when(cond, F.lit(label)) if expr is None else \
                expr.when(cond, F.lit(label))
        return expr
    raise InvalidAggregation(f"unsupported bucket {kind}")


def _parse_level(spec: dict):
    """Split one spec level into (bucket_entry|None, metric_entries).
    bucket_entry = (name, kind, body, sub_spec)."""
    buckets = []
    metrics = []
    for name, body in spec.items():
        if not isinstance(body, dict) or not body:
            raise InvalidAggregation(f"agg {name!r}: spec must be a dict")
        kinds = [k for k in body if k != "aggs"]
        if len(kinds) != 1:
            raise InvalidAggregation(
                f"agg {name!r}: exactly one aggregation kind expected, "
                f"got {kinds}")
        kind = kinds[0]
        if kind in _BUCKETS:
            buckets.append((name, kind, body[kind], body.get("aggs")))
        elif kind in _METRICS:
            if "aggs" in body:
                raise InvalidAggregation(
                    f"agg {name!r}: metric aggregations cannot have "
                    "sub-aggregations")
            metrics.append((name, kind, body[kind]))
        else:
            raise InvalidAggregation(
                f"agg {name!r}: unknown aggregation kind {kind!r} "
                f"(metrics: {_METRICS}; buckets: {_BUCKETS})")
    if len(buckets) > 1:
        raise InvalidAggregation(
            "one bucket aggregation per spec level (flat-frame output "
            "cannot hold sibling bucket trees)")
    return (buckets[0] if buckets else None), metrics


def _norm_sort_entries(sort) -> list[tuple[str, str]]:
    """ES sort entries come as "field", {"field": "desc"} or
    {"field": {"order": "desc"}} — normalize to (field, direction)."""
    out: list[tuple[str, str]] = []
    for s in sort or ():
        if isinstance(s, str):
            out.append((s, "asc"))
            continue
        for f, o in s.items():
            direction = o.get("order", "asc") if isinstance(o, dict) \
                else str(o)
            out.append((f, direction))
    return out


def _top_hits_fields(body: dict) -> list[str]:
    """Fields a top_hits metric touches: its sort keys plus the
    docvalue_fields it returns (quickwit top_hits retrieves doc values,
    aggregations.rs:85-172 — there is no stored-source fetch here)."""
    fields = [f for f, _ in _norm_sort_entries(body.get("sort"))]
    for f in body.get("docvalue_fields", ()):
        if f not in fields:
            fields.append(f)
    return fields


def _collect_fields(spec: dict) -> set[str]:
    out: set[str] = set()
    for _name, body in spec.items():
        sub = dict(body)
        nested = sub.pop("aggs", None)
        for kind, kb in sub.items():
            if kind == "top_hits":
                out |= set(_top_hits_fields(kb))
            elif isinstance(kb, dict) and kb.get("field") is not None:
                # missing 'field' on known kinds is rejected by
                # _validate_spec; unknown kinds fall through to
                # _parse_level's proper InvalidAggregation
                out.add(kb["field"])
        if nested:
            out |= _collect_fields(nested)
    return out


_CALENDAR_UNITS = {"year", "quarter", "month", "week", "day",
                   "hour", "minute", "second"}


def _validate_spec(spec: dict) -> None:
    """Reject malformed agg parameters as InvalidAggregation (-> 400)
    up front: without this, a bad interval/percent/unit surfaces as a
    DIVIDE_BY_ZERO / AnalysisException from inside a Spark stage — an
    internal error for what is user-controlled request input."""
    for name, body in spec.items():
        if not isinstance(body, dict):
            # must reject HERE: _collect_fields runs before _parse_level
            # and would crash with TypeError on a non-dict body
            raise InvalidAggregation(
                f"agg {name!r}: body must be an object, got "
                f"{type(body).__name__}")
        for kind, kb in body.items():
            if kind == "aggs":
                if isinstance(kb, dict):
                    _validate_spec(kb)
                continue
            if not isinstance(kb, dict):
                raise InvalidAggregation(
                    f"agg {name!r}: {kind} spec must be an object")
            if kind != "top_hits" and "field" not in kb \
                    and (kind in _BUCKETS or kind in _METRICS):
                # _collect_fields would KeyError before _parse_level
                # could produce its 400-shaped error
                raise InvalidAggregation(
                    f"agg {name!r}: {kind} needs a 'field'")
            if kind == "histogram":
                if float(kb.get("interval", 0)) <= 0:
                    raise InvalidAggregation(
                        f"agg {name!r}: histogram interval must be > 0")
            elif kind == "range":
                if not kb.get("ranges"):
                    raise InvalidAggregation(
                        f"agg {name!r}: range needs a non-empty ranges "
                        "list")
            elif kind == "terms":
                if int(kb.get("size", 10)) < 1:
                    raise InvalidAggregation(
                        f"agg {name!r}: terms size must be >= 1")
            elif kind == "percentiles":
                for p in kb.get("percents") or ():
                    if not 0 <= float(p) <= 100:
                        raise InvalidAggregation(
                            f"agg {name!r}: percent {p} outside "
                            "[0, 100]")
            elif kind == "date_histogram":
                unit = kb.get("calendar_interval")
                if unit is not None and \
                        str(unit) not in _CALENDAR_UNITS:
                    raise InvalidAggregation(
                        f"agg {name!r}: unknown calendar_interval "
                        f"{unit!r} (one of {sorted(_CALENDAR_UNITS)})")


def aggregate(searcher, query, spec: dict):
    """Run an ES-style aggregation spec over the docs matching `query`.

    Returns a Spark DataFrame (the searcher MUST carry a SparkSession —
    the spec front-end builds Spark plans, there is no pandas twin);
    one row per deepest bucket combination (see module doc).
    SIBLING bucket aggregations at the top level return a dict
    {agg_name: DataFrame} — the matched-doc relation is resolved once and
    shared by every sibling plan."""
    _validate_spec(spec)
    fields = sorted(_collect_fields(spec))
    known = {f["field"] for f in searcher.list_fields()}
    unknown = [f for f in fields if f not in known]
    if unknown and known and not getattr(searcher, "has_dynamic",
                                         False):
        # `known` empty = zero segments anywhere: nothing to
        # aggregate, every spec yields empty results (not an error)
        # reject up front: an unknown field would otherwise surface as
        # an executor-side KeyError from inside the leaf tasks. With a
        # dynamic catch-all any path MAY exist — missing ones yield
        # all-null values (zero buckets), like ES on a missing field.
        raise InvalidAggregation(
            f"unknown aggregation field(s) {unknown}; known: "
            f"{sorted(known)}")
    matched = searcher.matched_docs(query, fields)
    if hasattr(matched, "iloc"):
        # matched_docs returns pandas exactly when the searcher has no
        # SparkSession, so there is nothing to convert with — the spec
        # front-end is a Spark plan builder by design
        raise ValueError("aggregate() needs a SparkSession attached "
                         "to the searcher (IndexSearcher(dir, spark))")

    n_top_buckets = sum(
        1 for body in spec.values()
        if isinstance(body, dict)
        and any(k in _BUCKETS for k in body if k != "aggs"))
    n_top_metrics = len(spec) - n_top_buckets
    if n_top_buckets > 1 or (n_top_buckets >= 1 and n_top_metrics > 0):
        # sibling aggs: one frame per sibling (ES computes a sibling
        # metric over ALL matched docs, not per bucket). The matched
        # relation is NOT persisted here — each sibling re-evaluates it
        # (bounded by the sibling count); persisting would leak cached
        # blocks with no lifecycle hook to unpersist. Callers wanting
        # reuse can persist/unpersist around the call themselves.
        return {name: _aggregate_plan(matched, {name: body})
                for name, body in spec.items()}
    return _aggregate_plan(matched, spec)


def _aggregate_plan(matched, spec: dict):
    # walk the nesting chain: bucket levels outside-in, metrics at leaf
    levels = []  # [(name, kind, body)]
    cur = spec
    leaf_metrics = []
    while True:
        bucket, metrics = _parse_level(cur)
        if bucket is None:
            leaf_metrics = metrics
            break
        name, kind, body, sub = bucket
        if metrics:
            raise InvalidAggregation(
                "metric aggregations are supported at the deepest level "
                "only (flat rows carry one granularity)")
        levels.append((name, kind, body))
        if not sub:
            break
        cur = sub

    th = [(n, b) for n, k, b in leaf_metrics if k == "top_hits"]
    if th:
        if len(leaf_metrics) > 1:
            raise InvalidAggregation(
                "top_hits cannot be combined with other metrics at the "
                "same level (its output is per-hit rows, not per-bucket)")
        return _top_hits_plan(matched, levels, *th[0])

    # `order`/`size` are honored on the OUTERMOST bucket level only (the
    # flat-row output has one global row order); accepting them deeper
    # would silently return differently-ordered/untrimmed rows, so
    # reject instead
    for name, kind, body in levels[1:]:
        if kind == "terms" and ("order" in body or "size" in body):
            raise InvalidAggregation(
                f"terms order/size on nested level {name!r} is not "
                "supported — only the outermost bucket level orders and "
                "trims the flat rows")

    exprs = [F.count(F.lit(1)).alias("doc_count")]
    for name, kind, body in leaf_metrics:
        exprs.extend(_metric_exprs(name, kind, body))

    if not levels:
        return matched.agg(*exprs)

    out = matched
    level_names = []
    from pyspark.sql.types import DoubleType, LongType
    col_types = {f.name: f.dataType for f in matched.schema.fields}

    def _is_ms(body):
        # datetime fast fields are epoch-millis longs (doubles on the
        # dynamic-path transport); date_histogram truncates them
        # arithmetically instead of via timestamp functions
        return isinstance(col_types.get(body["field"]),
                          (LongType, DoubleType))

    from pyspark.sql.types import ArrayType
    for name, kind, body in levels:
        if kind == "terms" and isinstance(
                col_types.get(body["field"]), ArrayType):
            # multi-valued field: one bucket entry per element; a doc
            # counts once per element it carries (ES array-field terms
            # semantics; nulls keep their row so sibling metrics of
            # OTHER fields would still see the doc — they form no
            # bucket downstream)
            out = out.withColumn(name,
                                 F.explode_outer(_fcol(body["field"])))
        else:
            out = out.withColumn(
                name, _bucket_col(
                    kind, body,
                    field_is_millis=(kind == "date_histogram"
                                     and _is_ms(body))))
        level_names.append(name)
    out = out.groupBy(*level_names).agg(*exprs)

    # ordering + per-kind extras follow the OUTERMOST bucket agg; inner
    # levels order ascending after it
    name0, kind0, body0 = levels[0]
    if kind0 == "terms":
        # custom bucket order (tantivy TermsAggregation order, consumed
        # by the reference via quickwit-query/src/aggregations.rs:162):
        # {"_count": dir} (default desc) | {"_key": dir} |
        # {"<metric>[.<sub>]": dir}; ties always break on the key asc.
        target, direction = _terms_order(body0)
        w_term = Window.partitionBy(name0)
        if target == "_key":
            tkey = F.col(name0)
        elif target == "_count":
            # with nested sub-buckets a term spans several flat rows —
            # rank by the TERM's total doc_count, like ES
            tkey = F.sum("doc_count").over(w_term)
        else:
            col = target.replace(".", "_")
            if len(level_names) > 1:
                raise InvalidAggregation(
                    "terms order by a sub-metric requires the terms agg "
                    "to be the deepest bucket level (flat rows carry "
                    "leaf metrics only)")
            if col not in out.columns:
                raise InvalidAggregation(
                    f"terms order target {target!r} is not a metric of "
                    "this aggregation")
            tkey = F.col(col)
        key_ord = (F.col("_tkey").desc() if direction == "desc"
                   else F.col("_tkey").asc())
        out = out.withColumn("_tkey", tkey)
        order = [key_ord, F.col(name0).asc()]
        order += [F.col(n).asc() for n in level_names[1:]]
        out = out.orderBy(*order)
        size = body0.get("size")
        if size:
            # keep the top-N TERM buckets under the requested order,
            # with ALL their sub-bucket rows (dense_rank over the term
            # order key)
            w_all = Window.partitionBy()
            ranked = (out
                      .withColumn("_total",
                                  F.sum("doc_count").over(w_all))
                      .withColumn("_rank", F.dense_rank().over(
                          Window.partitionBy().orderBy(
                              key_ord, F.col(name0).asc()))))
            kept = ranked.filter(F.col("_rank") <= int(size))
            kept = kept.withColumn(
                f"{name0}_sum_other_doc_count",
                (F.col("_total")
                 - F.sum("doc_count").over(w_all)).cast("long"))
            out = kept.drop("_total", "_rank")
        out = out.drop("_tkey")
    elif kind0 == "histogram":
        min_dc = int(body0.get("min_doc_count", 1))
        bounds = body0.get("extended_bounds")
        if min_dc < 1 or bounds:
            interval = float(body0["interval"])
            offset = float(body0.get("offset", 0.0))
            agg_minmax = out.agg(F.min(name0).alias("lo"),
                                 F.max(name0).alias("hi"))
            if bounds:
                key = (F.floor((F.lit(float(bounds["min"])) - offset)
                               / interval) * interval + offset)
                key_hi = (F.floor((F.lit(float(bounds["max"])) - offset)
                                  / interval) * interval + offset)
                agg_minmax = agg_minmax.select(
                    F.least(F.col("lo"), key).alias("lo"),
                    F.greatest(F.col("hi"), key_hi).alias("hi"))
            # lo/hi are already bucket keys => the quotient is an integer
            # up to float ulps; round to nearest, never cast-truncate
            # (floor(-42.5)*0.1 divides back to -42.99999999999999, and a
            # cast would truncate to -42, dropping the real -4.3 bucket)
            keys = agg_minmax.select(F.explode(F.sequence(
                F.round((F.col("lo") - offset) / interval, 0).cast("long"),
                F.round((F.col("hi") - offset) / interval, 0).cast("long"))
            ).alias("_k")).select(
                (F.col("_k") * interval + offset).alias(name0))
            if len(level_names) > 1:
                raise InvalidAggregation(
                    "gap-filled histogram (min_doc_count=0 / "
                    "extended_bounds) must be the deepest bucket level")
            out = (keys.join(out, on=name0, how="left")
                   .withColumn("doc_count",
                               F.coalesce("doc_count", F.lit(0))))
        if min_dc >= 1:
            out = out.filter(F.col("doc_count") >= min_dc)
        out = out.orderBy(*[F.col(n).asc() for n in level_names])
    elif kind0 == "date_histogram" and _is_ms(body0):
        # millis-mode date_histogram: ES default min_doc_count is 0 —
        # fill the gaps between data min/max (and extended_bounds)
        # exactly like histogram, in epoch-millis arithmetic
        min_dc = int(body0.get("min_doc_count", 0))
        bounds = body0.get("extended_bounds")
        if min_dc < 1 or bounds:
            step = _parse_duration_ms(body0["fixed_interval"])
            off = _parse_duration_ms(body0["offset"]) \
                if "offset" in body0 else 0
            agg_minmax = out.agg(F.min(name0).alias("lo"),
                                 F.max(name0).alias("hi"))
            if bounds:
                blo = (F.floor((F.lit(int(bounds["min"])) - off) / step)
                       * step + off)
                bhi = (F.floor((F.lit(int(bounds["max"])) - off) / step)
                       * step + off)
                agg_minmax = agg_minmax.select(
                    F.least(F.col("lo"), blo).alias("lo"),
                    F.greatest(F.col("hi"), bhi).alias("hi"))
            if len(level_names) > 1:
                raise InvalidAggregation(
                    "gap-filled date_histogram must be the deepest "
                    "bucket level")
            keys = agg_minmax.where(F.col("lo").isNotNull()).select(
                F.explode(F.sequence(
                    ((F.col("lo") - off) / step).cast("long"),
                    ((F.col("hi") - off) / step).cast("long"))
                ).alias("_k")).select(
                (F.col("_k").cast("double") * step + off).cast(
                    col_types.get(body0["field"], LongType())
                    if not isinstance(col_types.get(body0["field"]),
                                      DoubleType) else "double")
                .alias(name0))
            out = (keys.join(out, on=name0, how="left")
                   .withColumn("doc_count",
                               F.coalesce("doc_count", F.lit(0))))
        if min_dc >= 1:
            out = out.filter(F.col("doc_count") >= min_dc)
        out = out.orderBy(*[F.col(n).asc() for n in level_names])
    elif kind0 == "range" and len(level_names) == 1:
        # the reference emits EVERY declared range, including empty
        # ones (rest-api-tests/scenarii/aggregations/0001: the
        # "medium" bucket appears with doc_count 0) — gap-fill from
        # the declared range list, like histogram min_doc_count=0.
        # Output order = DECLARATION order (the reference returns
        # buckets positionally as declared, not alphabetically).
        labels = [_range_label(r) for r in body0["ranges"]]
        keys = (out.sparkSession.createDataFrame(
            [(lb, i) for i, lb in enumerate(labels)],
            "_rk string, _rord int")
            .select(F.col("_rk").alias(name0), "_rord"))
        out = (keys.join(out, on=name0, how="left")
               .withColumn("doc_count",
                           F.coalesce("doc_count", F.lit(0)))
               .orderBy(F.col("_rord").asc())
               .drop("_rord"))
    else:
        out = out.orderBy(*[F.col(n).asc() for n in level_names])
    return out


def _top_hits_plan(matched, levels, name: str, body: dict):
    """top_hits as a deepest-level metric (quickwit supports it as a
    metric retrieving doc values, aggregations.rs:85-172): per bucket
    combination, the top `size` docs under the spec's sort, as one row
    per hit with a `<name>_rank` column. Executes as a window
    row_number over the bucket partitions — one shuffle on the bucket
    keys, no per-bucket driver work."""
    sort = body.get("sort") or ()
    if not sort:
        raise InvalidAggregation(
            "top_hits requires an explicit sort spec (the aggregation "
            "frame carries doc values, not scores)")
    size = int(body.get("size", 3))
    frm = int(body.get("from", 0))
    order = [F.col(f).desc() if direction == "desc" else F.col(f).asc()
             for f, direction in _norm_sort_entries(sort)]
    out = matched
    level_names = []
    for lname, lkind, lbody in levels:
        out = out.withColumn(lname, _bucket_col(lkind, lbody))
        level_names.append(lname)
    w = Window.partitionBy(*[F.col(n) for n in level_names]) \
        .orderBy(*order)
    rank_col = f"{name}_rank"
    out = (out.withColumn(rank_col, F.row_number().over(w))
           .filter((F.col(rank_col) > frm)
                   & (F.col(rank_col) <= frm + size)))
    fields = _top_hits_fields(body)
    out = out.select(*level_names, *fields, rank_col)
    return out.orderBy(*[F.col(n).asc() for n in level_names],
                       F.col(rank_col).asc())
