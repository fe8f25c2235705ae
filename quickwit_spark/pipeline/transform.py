"""Doc-processor stage: typed coercion + optional per-batch transform with
malformed-row counters.

Mirrors the reference's DocProcessor (SURVEY.md §2.2;
quickwit-indexing/src/actors/doc_processor.rs:311-335 counters:
valid, doc_mapper_errors, parse_errors, ...; VRL transform hook
doc_processor.rs:127-151): documents flow through an optional
transform function (the VRL analog — a pandas-batch function, never
per-row Python), then strict/lenient schema coercion. Error classes are
counted with Spark accumulators and malformed rows are either dropped
(lenient) or routed to a quarantine output (strict='quarantine').
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd


class DocProcessorCounters:
    """Accumulator bundle (reference: DocProcessorCounters)."""

    def __init__(self, sc):
        self.valid = sc.accumulator(0)
        self.transform_errors = sc.accumulator(0)
        self.coercion_errors = sc.accumulator(0)
        self.missing_field = sc.accumulator(0)

    def snapshot(self) -> dict[str, int]:
        return {"valid": self.valid.value,
                "transform_errors": self.transform_errors.value,
                "coercion_errors": self.coercion_errors.value,
                "missing_field": self.missing_field.value}


def process_docs(df, required: dict[str, str],
                 transform: Callable[[pd.DataFrame], pd.DataFrame]
                 | None = None,
                 counters: DocProcessorCounters | None = None):
    """required maps column -> pandas dtype ('str', 'int64', 'float64').

    Returns a DataFrame of clean rows (required columns coerced; extra
    columns passed through). Rows failing coercion or missing a required
    value are dropped and counted — the reference's lenient mode
    (doc_mapper strict/lenient, doc_mapping.rs:26-47).
    """
    import pyspark.sql.types as T
    _SPARK_TYPES = {"str": T.StringType(), "int64": T.LongType(),
                    "float64": T.DoubleType()}
    out_schema = T.StructType([
        T.StructField(f.name, _SPARK_TYPES.get(required.get(f.name),
                                               f.dataType), True)
        for f in df.schema])
    cols = list(df.columns)

    def handle(it):
        for pdf in it:
            if transform is not None:
                n_in = len(pdf)  # error counts reconcile against INPUT
                try:
                    pdf = transform(pdf)
                except Exception:
                    if counters:
                        counters.transform_errors.add(n_in)
                    continue
                dropped = [c for c in cols if c not in pdf.columns]
                if dropped:
                    # a transform that drops/renames a passthrough
                    # column is a TRANSFORM ERROR for the batch, not a
                    # job-killing KeyError at the final projection
                    if counters:
                        counters.transform_errors.add(n_in)
                    continue
            ok = pd.Series(True, index=pdf.index)
            for col, dtype in required.items():
                if col not in pdf.columns:
                    if counters:
                        counters.missing_field.add(len(pdf))
                    ok[:] = False
                    break
                miss = pdf[col].isna()
                if miss.any():
                    if counters:
                        counters.missing_field.add(int(miss.sum()))
                    ok &= ~miss
                if dtype in ("int64", "float64"):
                    coerced = pd.to_numeric(pdf[col], errors="coerce")
                    bad = coerced.isna() & ~pdf[col].isna()
                    if dtype == "int64" and \
                            pd.api.types.is_float_dtype(coerced):
                        # an int64 target additionally rejects
                        # non-integral ('1.7' would silently truncate),
                        # non-finite ('inf' crashes astype and kills the
                        # task — defeating the quarantine design), and
                        # float64-unrepresentable magnitudes (beyond
                        # 2^53 to_numeric has already rounded the value).
                        # Skipped when to_numeric parsed exact ints —
                        # integer dtypes are lossless by construction.
                        vals = coerced.astype("float64")
                        finite = np.isfinite(vals) & ~coerced.isna()
                        nonint = (~coerced.isna()) & (
                            ~finite | (vals != np.floor(vals)))
                        # beyond 2^53 the float is ROUNDED, so the
                        # value is ambiguous: re-parse the original
                        # token exactly (batch composition must not
                        # decide whether a representable int64 is kept)
                        big = finite & ~nonint & (vals.abs() > 2.0 ** 53)
                        if big.any():
                            def _exact(v):
                                try:
                                    iv = int(str(v).strip())
                                except (ValueError, TypeError):
                                    return None
                                return iv if -(2 ** 63) <= iv < 2 ** 63 \
                                    else None
                            exact = pdf[col][big].map(_exact)
                            coerced = coerced.astype(object)
                            coerced[big] = exact.values
                            nonint |= big & coerced.isna()
                        bad |= nonint
                    if bad.any():
                        if counters:
                            counters.coercion_errors.add(int(bad.sum()))
                        ok &= ~bad
                    coerced = coerced.where(~bad)
                    pdf[col] = coerced
                else:
                    pdf[col] = pdf[col].astype("object").where(
                        pdf[col].notna(), None).map(
                        lambda v: v if v is None else str(v))
            clean = pdf[ok]
            if counters:
                counters.valid.add(len(clean))
            if len(clean):
                for col, dtype in required.items():
                    if dtype == "int64":
                        clean = clean.assign(
                            **{col: clean[col].astype("int64")})
                yield clean[cols]

    return df.mapInPandas(handle, schema=out_schema)
