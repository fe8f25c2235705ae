"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure DataFrame plans (JVM-side expressions),
each oracle-checkable in ANSI SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_expr

# tiny deterministic stopword lists (heuristic language id over them)
STOPWORDS = {
    "en": ("the", "and", "of", "to", "value", "fast"),
    "fr": ("le", "la", "et", "de", "table", "part"),
    "es": ("el", "la", "y", "de", "merge", "scan"),
}


def _count_in(tok_col, words) -> "F.Column":
    return F.size(F.filter(tok_col, lambda x: x.isin(*[F.lit(w) for w in words])))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
            ) -> DataFrame:
    """n-gram/stopword-heuristic language guess with fixed tie order
    (en > fr > es)."""
    d = df.withColumn("_toks", tokens_expr(text_col))
    scores = {lang: _count_in(F.col("_toks"), ws)
              for lang, ws in STOPWORDS.items()}
    pred = (F.when((scores["en"] >= scores["fr"]) &
                   (scores["en"] >= scores["es"]), F.lit("en"))
            .when(scores["fr"] >= scores["es"], F.lit("fr"))
            .otherwise(F.lit("es")))
    return d.select(F.col(id_col), pred.alias("pred_lang"),
                    scores["en"].alias("hits_en"),
                    scores["fr"].alias("hits_fr"),
                    scores["es"].alias("hits_es"))


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Heuristic quality: token count, unique-token ratio, mean token
    length, stopword ratio, combined score (deterministic f64)."""
    d = df.withColumn("_toks", tokens_expr(text_col))
    n_tok = F.size("_toks").cast("double")
    n_uniq = F.size(F.array_distinct("_toks")).cast("double")
    tok_chars = F.aggregate("_toks", F.lit(0),
                            lambda a, x: a + F.length(x)).cast("double")
    n_stop = _count_in(F.col("_toks"), STOPWORDS["en"]).cast("double")
    # zero-token docs (empty / punctuation-only text) are well-defined
    # 0.0 on every ratio, NOT a 0/0 — which under ANSI (this repo's
    # default) aborts the whole job with DIVIDE_BY_ZERO, and under
    # legacy mode poisons downstream filters with NULLs
    zero = n_tok > F.lit(0.0)
    uniq_ratio = F.when(zero, n_uniq / n_tok).otherwise(F.lit(0.0))
    mean_len = F.when(zero, tok_chars / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(zero, n_stop / n_tok).otherwise(F.lit(0.0))
    score = (F.least(F.lit(1.0), n_tok / F.lit(100.0)) * F.lit(0.3)
             + uniq_ratio * F.lit(0.4)
             + F.least(F.lit(1.0), mean_len / F.lit(8.0)) * F.lit(0.3))

    return d.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tok"),
        _r6(uniq_ratio).alias("uniq_ratio"),
        _r6(mean_len).alias("mean_len"),
        _r6(stop_ratio).alias("stop_ratio"),
        _r6(score).alias("quality"))


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs / digit runs / single punctuation)."""
    ws = F.size(F.filter(F.split(F.col(text_col), "\\s+"),
                         lambda x: x != F.lit("")))
    bpe = F.size(F.expr(
        rf"regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)"))
    return df.select(F.col(id_col), ws.alias("ws_tokens"),
                     bpe.alias("bpe_tokens"),
                     F.length(text_col).alias("n_chars_actual"))


def pii_counts(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """PII-pattern surface counts per document (training-data pipeline
    redaction triage): emails, URLs, long digit runs (phone/account
    shaped), IPv4 literals. Pure JVM regexp expressions — the patterns
    stay in the portable RE subset both Spark (java.util.regex) and the
    DuckDB oracle (RE2) interpret identically: no backreferences, no
    lookaround, explicit character classes."""
    def n(pattern: str) -> "F.Column":
        return F.size(F.expr(
            rf"regexp_extract_all({text_col}, '{pattern}', 0)"))
    emails = n(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+")
    urls = n(r"https?://[^\\s]+")
    digit_runs = n(r"[0-9]{9,}")
    ipv4 = n(r"[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}")
    total = emails + urls + digit_runs + ipv4
    return df.select(F.col(id_col), emails.alias("n_emails"),
                     urls.alias("n_urls"),
                     digit_runs.alias("n_long_digit_runs"),
                     ipv4.alias("n_ipv4"),
                     total.alias("n_pii_signals"))


def _r6(col) -> "F.Column":
    # floor-based 6-decimal rounding (see quality_score): identical
    # double arithmetic in Spark and the DuckDB oracle at midpoints
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def repetition_signals(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, public):
    the standard training-data quality filters that catch boilerplate
    and degenerate generations.

    Per document:
      n_tok            token count
      dup_token_frac   1 - distinct/total tokens (bulk repetitiveness)
      top_token_frac   occurrences of the most frequent token / n_tok
      top_bigram_frac  occurrences of the most frequent word bigram /
                       bigram count (tie -> the max count, not the term)
      n_lines          non-empty '\\n' lines
      dup_line_frac    1 - distinct/total non-empty lines
      dup_line_char_frac  chars inside REPEATED line instances / total
                       line chars (each extra occurrence counts)

    All pure JVM array expressions — no shuffle, no Python. The
    most-frequent counts are computed as transform(distinct, u ->
    count(u in toks)) + array_max: O(unique * n) per doc stays inside
    whole-stage codegen and beats a per-doc Python frequency dict at any
    scale; docs are bounded (a 100 TB corpus is wide, not per-doc deep).
    Fractions are 0.0 for empty docs (no NULL poisoning downstream
    filters)."""
    d = df.withColumn("_toks", tokens_expr(text_col))
    n_tok = F.size("_toks")
    uniq = F.array_distinct("_toks")
    top_tok = F.array_max(F.transform(
        uniq, lambda u: F.size(F.filter(F.col("_toks"),
                                        lambda x: x == u))))
    n_big = F.greatest(n_tok - F.lit(1), F.lit(0))
    bigrams = F.zip_with(F.slice(F.col("_toks"), F.lit(1), n_big),
                         F.slice(F.col("_toks"), F.lit(2), n_big),
                         lambda a, b: F.concat(a, F.lit(" "), b))
    d = d.withColumn("_bi", bigrams)
    top_big = F.array_max(F.transform(
        F.array_distinct("_bi"),
        lambda u: F.size(F.filter(F.col("_bi"), lambda x: x == u))))
    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda x: x != F.lit(""))
    d = d.withColumn("_lines", lines)
    n_lines = F.size("_lines")
    n_uline = F.size(F.array_distinct("_lines"))
    line_chars = F.aggregate("_lines", F.lit(0),
                             lambda a, x: a + F.length(x))
    uline_chars = F.aggregate(F.array_distinct("_lines"), F.lit(0),
                              lambda a, x: a + F.length(x))

    def frac(num, den):
        return F.when(den > 0, _r6(num.cast("double")
                                   / den.cast("double"))) \
            .otherwise(F.lit(0.0))

    return d.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tok"),
        frac(n_tok - F.size(uniq), n_tok).alias("dup_token_frac"),
        frac(F.coalesce(top_tok, F.lit(0)), n_tok)
        .alias("top_token_frac"),
        frac(F.coalesce(top_big, F.lit(0)), F.size("_bi"))
        .alias("top_bigram_frac"),
        n_lines.cast("long").alias("n_lines"),
        frac(n_lines - n_uline, n_lines).alias("dup_line_frac"),
        frac(line_chars - uline_chars, line_chars)
        .alias("dup_line_char_frac"))


def token_rarity(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_count: int = 2) -> DataFrame:
    """Corpus-relative token rarity (the deterministic stand-in for an
    LM-perplexity filter: documents dominated by rare/garbled tokens
    score low under any language model). Per document:

      n_tok             token occurrences
      mean_freq_bucket  mean of floor(log2(corpus count of the token))
                        — high = common vocabulary, low = rare
      rare_frac         fraction of occurrences whose corpus count
                        <= min_count (hapax/garbage rate)

    Determinism: buckets are INTEGERS (floor(log2(count)) is exact at
    the only boundary values, powers of two), so per-doc sums are exact
    bigint arithmetic — no float-summation-order dependence, unlike a
    mean-log-probability, which is why this variant is the oracle-safe
    one. Two shuffles (vocab count, doc re-agg); the token join skews
    on Zipf heads — AQE skew-join splits them, and the join is a plain
    count lookup, never a collect."""
    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.explode(tokens_expr(text_col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    j = toks.join(vocab, "tok")
    per = j.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.floor(F.log2("cnt")).cast("long")).alias("_sb"),
        F.sum(F.when(F.col("cnt") <= F.lit(min_count), 1).otherwise(0))
        .cast("long").alias("_nr"))
    out = per.select(
        "doc_id", F.col("n_tok").cast("long").alias("n_tok"),
        _r6(F.col("_sb").cast("double") / F.col("n_tok").cast("double"))
        .alias("mean_freq_bucket"),
        _r6(F.col("_nr").cast("double") / F.col("n_tok").cast("double"))
        .alias("rare_frac"))
    ids = df.select(F.col(id_col).alias("doc_id"))
    return (ids.join(out, "doc_id", "left")
            .na.fill({"n_tok": 0})
            .na.fill({"mean_freq_bucket": 0.0, "rare_frac": 0.0}))


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set (order-
    and repetition-insensitive content identity)."""
    toks = tokens_expr(text_col)
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return df.select(F.col(id_col), fp.alias("fingerprint"))
