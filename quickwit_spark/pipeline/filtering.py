"""Corpus-level filtering operators for training-data pipelines:
benchmark decontamination, deterministic stratified sampling,
Gopher-style composite quality filtering, and training-mix token
budgeting.

All operators are pure DataFrame plans (JVM-side expressions, no Python
UDFs) and each is oracle-checkable in ANSI SQL. Scale notes per
operator document the shuffle structure at 100 TB.

Public provenance: n-gram decontamination follows the eval-overlap
procedure described in the GPT-3 paper (Brown et al. 2020, appendix C)
and successors; the composite quality rules follow Gopher (Rae et al.
2021 §A1.1) and C4 (Raffel et al. 2020 §2.2). No proprietary systems
are referenced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _hash32, shingles_df, tokens_expr
from .textstats import STOPWORDS, _r6


def decontaminate(df: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text", n: int = 13,
                  min_overlap: int = 1,
                  broadcast_benchmark: bool = True) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    n-grams with an evaluation set.

    Returns one row per input document: (doc_id, n_contaminated,
    contaminated) where n_contaminated counts the document's DISTINCT
    n-gram shingles that also occur anywhere in the benchmark, and
    contaminated = n_contaminated >= min_overlap.

    Scale shape (100 TB corpus, benchmark of ~10^6-10^8 n-grams): the
    benchmark shingle set is built once and broadcast
    (broadcast_benchmark=True), so the corpus side sees a narrow
    broadcast-hash semi-join with NO corpus shuffle; the only shuffle is
    the groupBy(doc_id) overlap count, keyed by doc id (uniform — no
    skew). With broadcast_benchmark=False (benchmark too large for
    executor memory) it degrades to one shuffle on the shingle string.
    The default n=13 matches the published eval-overlap window.
    """
    corpus_sh = shingles_df(df, id_col, text_col, n)
    bench_sh = (shingles_df(
        benchmark.select(F.lit(0).alias("_bid"),
                         F.col(bench_text_col).alias("_btext")),
        "_bid", "_btext", n)
        .select("shingle").distinct())
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    overlap = (corpus_sh.join(bench_sh, "shingle")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_contaminated")))
    ids = df.select(F.col(id_col).alias("doc_id"))
    return (ids.join(overlap, "doc_id", "left")
            .na.fill({"n_contaminated": 0})
            .select("doc_id",
                    F.col("n_contaminated").cast("long"),
                    (F.col("n_contaminated") >= F.lit(min_overlap))
                    .alias("contaminated")))


def sample_uniform_expr(id_col: str = "doc_id", seed: int = 42):
    """Deterministic per-row uniform in [0, 1): md5 of "<id>:<seed>"
    folded to 6 decimal digits. Identical in Spark and the SQL oracle;
    stable under repartitioning/retries (unlike rand())."""
    h = _hash32(F.concat(F.col(id_col).cast("string"),
                         F.lit(f":{seed}")))
    return (h % F.lit(1_000_000)).cast("double") / F.lit(1_000_000.0)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      seed: int = 42,
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff its hash-derived
    uniform is below its stratum's rate.

    rates maps stratum value -> keep probability; strata absent from the
    map use default_rate. Sampling is a pure per-row predicate — no
    shuffle, no RNG state, fully reproducible and resumable (the same
    row always gets the same verdict across retries and cluster sizes,
    which `rand()` does not guarantee). At 100 TB this is a narrow
    map-side filter fused into the scan.
    """
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == F.lit(k),
                      F.lit(float(v))).otherwise(rate)
    return df.where(sample_uniform_expr(id_col, seed) < rate)


def gopher_filter(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  min_tokens: int = 50, max_tokens: int = 100_000,
                  min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                  min_alpha_frac: float = 0.80,
                  max_symbol_ratio: float = 0.10,
                  max_dup_line_frac: float = 0.30,
                  min_stopword_hits: int = 2) -> DataFrame:
    """Gopher-style composite quality filter (Rae et al. 2021 §A1.1):
    per-document boolean rules plus the conjunction.

    Rules (each returned as its own column so pipelines can report WHY
    a document was dropped, not just that it was):
      r_ntok      min_tokens <= word count <= max_tokens
      r_meanlen   min_mean_len <= mean word length <= max_mean_len
      r_alpha     fraction of words containing an alphabetic char
                  >= min_alpha_frac
      r_symbol    ('#' chars + '...' occurrences) / words
                  <= max_symbol_ratio
      r_dupline   repeated-line fraction <= max_dup_line_frac
      r_stop      at least min_stopword_hits DISTINCT stopwords present
      keep        all of the above

    Words are whitespace tokens (the published rules operate on words,
    not normalized alnum tokens). Single pass, pure JVM array
    expressions, no shuffle — at 100 TB this fuses into the scan as a
    narrow projection+filter stage.
    """
    words = F.filter(F.split(F.col(text_col), "\\s+"),
                     lambda x: x != F.lit(""))
    d = df.withColumn("_w", words)
    n_w = F.size("_w")
    w_chars = F.aggregate("_w", F.lit(0), lambda a, x: a + F.length(x))
    mean_len = F.when(n_w > 0, w_chars.cast("double") / n_w.cast("double")
                      ).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter("_w", lambda x: x.rlike("[A-Za-z]")))
    alpha_frac = F.when(n_w > 0, n_alpha.cast("double")
                        / n_w.cast("double")).otherwise(F.lit(0.0))
    n_hash = F.length(text_col) - F.length(
        F.regexp_replace(text_col, "#", ""))
    n_ellipsis = F.size(F.expr(
        rf"regexp_extract_all({text_col}, '\\.\\.\\.', 0)"))
    symbol_ratio = F.when(n_w > 0, (n_hash + n_ellipsis).cast("double")
                          / n_w.cast("double")).otherwise(F.lit(0.0))
    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda x: x != F.lit(""))
    d = d.withColumn("_lines", lines)
    n_lines = F.size("_lines")
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct("_lines"))).cast("double")
        / n_lines.cast("double")).otherwise(F.lit(0.0))
    toks = tokens_expr(text_col)
    stop_hits = F.size(F.filter(
        F.array_distinct(toks),
        lambda x: x.isin(*[F.lit(w) for w in STOPWORDS["en"]])))

    r_ntok = (n_w >= F.lit(min_tokens)) & (n_w <= F.lit(max_tokens))
    r_meanlen = ((mean_len >= F.lit(float(min_mean_len)))
                 & (mean_len <= F.lit(float(max_mean_len))))
    r_alpha = alpha_frac >= F.lit(float(min_alpha_frac))
    r_symbol = symbol_ratio <= F.lit(float(max_symbol_ratio))
    r_dupline = dup_line_frac <= F.lit(float(max_dup_line_frac))
    r_stop = stop_hits >= F.lit(min_stopword_hits)
    return d.select(
        F.col(id_col),
        n_w.cast("long").alias("n_words"),
        _r6(mean_len).alias("mean_word_len"),
        _r6(alpha_frac).alias("alpha_frac"),
        _r6(symbol_ratio).alias("symbol_ratio"),
        _r6(dup_line_frac).alias("dup_line_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
        r_ntok.alias("r_ntok"), r_meanlen.alias("r_meanlen"),
        r_alpha.alias("r_alpha"), r_symbol.alias("r_symbol"),
        r_dupline.alias("r_dupline"), r_stop.alias("r_stop"),
        (r_ntok & r_meanlen & r_alpha & r_symbol & r_dupline & r_stop)
        .alias("keep"))


def boilerplate_lines(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      min_docs: int = 3) -> DataFrame:
    """Cross-document repeated lines (C4 §2.2's boilerplate rule: a line
    occurring in >= min_docs distinct documents is boilerplate — nav
    bars, cookie banners, license headers). Returns (line, n_docs) for
    flagged lines.

    One explode + one count-distinct shuffle keyed by the line string;
    hot boilerplate lines are exactly the high-frequency keys, but the
    aggregation is a count (partial/final combine), not a collect — no
    skew blowup at 100 TB."""
    lines = (df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(F.split(F.col(text_col), "\n"),
                           lambda x: x != F.lit(""))).alias("line"))
        .distinct())
    return (lines.groupBy("line")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .where(F.col("n_docs") >= F.lit(min_docs)))


def strip_boilerplate(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      min_docs: int = 3) -> DataFrame:
    """Remove boilerplate lines from every document, preserving the
    remaining lines' original order. Returns (doc_id, text, n_removed).

    Plan shape: the flagged-line set from boilerplate_lines is joined
    back line-by-line (left anti on the line string); at 100 TB the
    flagged set is small (boilerplate is by definition high-frequency,
    so few distinct strings) and broadcasts. Reassembly keeps order via
    posexplode + sort-by-position, all JVM-side."""
    flagged = F.broadcast(boilerplate_lines(df, id_col, text_col,
                                            min_docs)
                          .select(F.col("line").alias("_bline")))
    pos = (df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.filter(F.split(F.col(text_col), "\n"),
                              lambda x: x != F.lit("")))
        .alias("pos", "line")))
    kept = pos.join(flagged, pos["line"] == flagged["_bline"],
                    "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.concat_ws(
                   "\n",
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "line"))),
                       lambda s: s["line"])).alias("text"),
                   F.count("*").alias("_n_kept")))
    totals = (pos.groupBy("doc_id")
              .agg(F.count("*").alias("_n_lines")))
    ids = df.select(F.col(id_col).alias("doc_id"))
    return (ids.join(totals, "doc_id", "left")
            .join(rebuilt, "doc_id", "left")
            .na.fill({"_n_lines": 0, "_n_kept": 0})
            .na.fill({"text": ""})
            .select("doc_id", "text",
                    (F.col("_n_lines") - F.col("_n_kept")).cast("long")
                    .alias("n_removed")))


def training_mix(df: DataFrame, targets: dict[str, float],
                 budget_tokens: int, strata_col: str = "lang",
                 text_col: str = "text") -> DataFrame:
    """Training-mix token budgeting: given per-stratum target shares of a
    total token budget, compute the per-stratum sampling rate that hits
    the budget.

    Returns one row per stratum: (stratum, n_docs, n_tokens,
    target_share, sample_rate, expected_tokens) with
    sample_rate = min(1, budget * share / n_tokens) — a stratum with
    fewer tokens than its allocation is taken whole (rate 1.0, budget
    under-filled) rather than oversampled. Feed the rates into
    stratified_sample() to materialize the mix.

    One aggregation shuffle keyed by the stratum (cardinality = number
    of languages/sources, tiny); token counting is a map-side
    expression, so at 100 TB this is one pass + one small agg.
    """
    toks = F.size(F.filter(F.split(F.col(text_col), "\\s+"),
                           lambda x: x != F.lit("")))
    agg = (df.groupBy(F.col(strata_col).alias("stratum"))
           .agg(F.count("*").alias("n_docs"),
                F.sum(toks).alias("n_tokens")))
    share = F.lit(0.0)
    for k, v in sorted(targets.items()):
        share = F.when(F.col("stratum") == F.lit(k),
                       F.lit(float(v))).otherwise(share)
    # a stratum whose docs are all empty aggregates 0 tokens: its rate
    # is 0.0 by definition, not a DIVIDE_BY_ZERO abort under ANSI
    rate = F.when(
        F.col("n_tokens") > F.lit(0),
        F.least(F.lit(1.0),
                F.lit(float(budget_tokens)) * share
                / F.col("n_tokens").cast("double"))).otherwise(F.lit(0.0))
    return agg.select(
        "stratum", "n_docs", F.col("n_tokens").cast("long").alias("n_tokens"),
        _r6(share).alias("target_share"),
        _r6(rate).alias("sample_rate"),
        F.floor(rate * F.col("n_tokens").cast("double")).cast("long")
        .alias("expected_tokens"))
