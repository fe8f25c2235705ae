"""Repetition quality signals (Gopher-style filters, textstats.py).

The other textstats operators are pinned by the driver gate rows
(text_lang_id / quality / token_counts / fingerprint / pii); this file
pins the repetition signals' edge cases, which the gate corpus (no
empty docs) cannot reach.
"""

import pandas as pd
import pytest

from quickwit_spark.pipeline.textstats import repetition_signals


def _run(spark, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    return (repetition_signals(df).toPandas()
            .set_index("doc_id").sort_index())


def test_repetition_signals(spark):
    out = _run(spark, [
        (0, "a b a b a b"),                  # heavy bigram repetition
        (1, "x y z"),                        # all distinct
        (2, ""),                             # empty -> all zeros
        (3, "solo"),                         # one token, no bigrams
        (4, "dup\ndup\nother line\ndup"),    # repeated lines
    ])
    r0 = out.loc[0]
    assert r0["n_tok"] == 6
    assert r0["dup_token_frac"] == pytest.approx(4 / 6, abs=1e-6)
    assert r0["top_token_frac"] == pytest.approx(3 / 6, abs=1e-6)
    # bigrams: "a b" x3, "b a" x2 -> top 3/5
    assert r0["top_bigram_frac"] == pytest.approx(3 / 5, abs=1e-6)

    r1 = out.loc[1]
    assert r1["dup_token_frac"] == 0.0
    assert r1["top_token_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert r1["top_bigram_frac"] == pytest.approx(1 / 2, abs=1e-6)

    r2 = out.loc[2]
    assert (r2[["n_tok", "dup_token_frac", "top_token_frac",
                "top_bigram_frac", "n_lines", "dup_line_frac",
                "dup_line_char_frac"]] == 0).all()

    r3 = out.loc[3]
    assert r3["n_tok"] == 1 and r3["top_token_frac"] == 1.0
    assert r3["top_bigram_frac"] == 0.0  # no bigrams -> 0, not NULL

    r4 = out.loc[4]
    assert r4["n_lines"] == 4
    assert r4["dup_line_frac"] == pytest.approx(2 / 4, abs=1e-6)
    # chars: dup(3)*3 + other line(10); repeated instances = 2 dups = 6
    assert r4["dup_line_char_frac"] == pytest.approx(
        6 / 19, abs=1e-6)


def test_repetition_signals_no_nulls(spark):
    out = _run(spark, [(i, t) for i, t in
                       enumerate(["", "a", "a a", "\n\n", "a\na"])])
    assert not out.isna().any().any()


def test_token_rarity_signals(spark):
    from quickwit_spark.pipeline.textstats import token_rarity
    rows = [
        (1, "common common common common"),      # all common
        (2, "common rareword"),                  # half rare (cnt==1)
        (3, ""),                                 # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = token_rarity(df, min_count=1).toPandas().set_index("doc_id")
    # 'common' occurs 5x -> bucket floor(log2(5)) = 2; 'rareword' 1x -> 0
    assert int(out.loc[1, "n_tok"]) == 4
    assert out.loc[1, "mean_freq_bucket"] == 2.0
    assert out.loc[1, "rare_frac"] == 0.0
    assert out.loc[2, "mean_freq_bucket"] == 1.0  # (2 + 0) / 2
    assert out.loc[2, "rare_frac"] == 0.5
    assert int(out.loc[3, "n_tok"]) == 0
    assert out.loc[3, "rare_frac"] == 0.0


def test_quality_score_zero_token_docs(spark):
    """Empty / punctuation-only docs are well-defined 0.0 rows — under
    ANSI mode the unguarded 0/0 aborted the whole job."""
    import pandas as pd

    from quickwit_spark.pipeline.textstats import quality_score

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma", "", "!!! ..."]}))
    out = quality_score(df).toPandas().set_index("doc_id")
    assert out.loc[2, "n_tok"] == 0
    assert out.loc[2, "quality"] == 0.0
    assert out.loc[3, "uniq_ratio"] == 0.0
    assert out.loc[1, "quality"] > 0
