"""Semantic tests for the corpus filtering operators (decontamination,
stratified sampling, Gopher-rule quality filter, training-mix budgeting)
beyond what the DuckDB contract check pins."""

import pandas as pd
from pyspark.sql import functions as F

from quickwit_spark.pipeline.filtering import (
    decontaminate,
    gopher_filter,
    stratified_sample,
    training_mix,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_overlap(spark):
    corpus = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "totally unrelated words appear here instead now"),
        (3, "quick brown fox seen again in this one"),
    ])
    bench = spark.createDataFrame(
        [("benchmark asks about the quick brown fox story",)],
        "text string")
    out = (decontaminate(corpus, bench, n=3, min_overlap=1)
           .toPandas().set_index("doc_id"))
    # doc 1 shares "the quick brown" / "quick brown fox"; doc 3 shares
    # "quick brown fox"; doc 2 shares nothing
    assert bool(out.loc[1, "contaminated"])
    assert bool(out.loc[3, "contaminated"])
    assert not bool(out.loc[2, "contaminated"])
    assert int(out.loc[2, "n_contaminated"]) == 0
    assert int(out.loc[1, "n_contaminated"]) >= 2


def test_decontaminate_min_overlap_threshold(spark):
    corpus = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    bench = spark.createDataFrame([("alpha beta gamma nothing else",)],
                                  "text string")
    # exactly one shared 3-gram ("alpha beta gamma"): below min_overlap=2
    out = (decontaminate(corpus, bench, n=3, min_overlap=2)
           .toPandas().set_index("doc_id"))
    assert int(out.loc[1, "n_contaminated"]) == 1
    assert not bool(out.loc[1, "contaminated"])


def test_stratified_sample_deterministic_and_rate(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = stratified_sample(df, {"en": 1.0, "fr": 0.0}, seed=3).toPandas()
    # rate 1.0 keeps the whole stratum, 0.0 drops it entirely
    assert set(a["lang"]) == {"en"} and len(a) == 1000
    b1 = stratified_sample(df, {"en": 0.3, "fr": 0.3}, seed=3).toPandas()
    b2 = stratified_sample(df, {"en": 0.3, "fr": 0.3}, seed=3).toPandas()
    assert sorted(b1["doc_id"]) == sorted(b2["doc_id"])  # reproducible
    assert 0.2 < len(b1) / 2000 < 0.4  # near the nominal rate
    c = stratified_sample(df, {"en": 0.3}, seed=4).toPandas()
    assert sorted(c["doc_id"]) != sorted(
        b1[b1.lang == "en"]["doc_id"])  # seed changes the kept set


def test_gopher_filter_rules_fire_individually(spark):
    good = " ".join(["the quick value fast and of to brown fox"] * 8)
    rows = [
        (1, good),                                     # passes all
        (2, "too short"),                              # r_ntok
        (3, " ".join(["### ###"] * 40)),               # r_alpha + r_symbol
        (4, good + "\nfoo\nfoo\nfoo\nfoo\nfoo\nfoo"),  # r_dupline
        (5, " ".join(["zz qq ww ee rr tt yy uu"] * 10)),  # r_stop
    ]
    out = (gopher_filter(_docs(spark, rows), min_tokens=30)
           .toPandas().set_index("doc_id"))
    assert bool(out.loc[1, "keep"])
    assert not bool(out.loc[2, "r_ntok"]) and not bool(out.loc[2, "keep"])
    assert not bool(out.loc[3, "r_alpha"])
    assert not bool(out.loc[3, "r_symbol"])
    assert not bool(out.loc[4, "r_dupline"]) and not bool(out.loc[4, "keep"])
    assert not bool(out.loc[5, "r_stop"]) and not bool(out.loc[5, "keep"])


def test_training_mix_budget_math(spark):
    rows = ([("en", "w " * 99 + "w")] * 10      # 1000 en tokens
            + [("fr", "w " * 99 + "w")] * 2)    # 200 fr tokens
    df = spark.createDataFrame(rows, "lang string, text string")
    out = (training_mix(df, {"en": 0.5, "fr": 0.5}, budget_tokens=400)
           .toPandas().set_index("stratum"))
    assert int(out.loc["en", "n_tokens"]) == 1000
    # en: 400*0.5/1000 = 0.2; fr: 400*0.5/200 = 1.0 capped
    assert abs(out.loc["en", "sample_rate"] - 0.2) < 1e-9
    assert out.loc["fr", "sample_rate"] == 1.0
    assert int(out.loc["en", "expected_tokens"]) == 200
    assert int(out.loc["fr", "expected_tokens"]) == 200


def test_mix_rates_feed_stratified_sample(spark):
    """The advertised composition: training_mix rates -> stratified
    sampling produces approximately the budgeted token counts."""
    rows = [(i, "en" if i < 800 else "fr", "tok " * 49 + "tok")
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    mix = (training_mix(df, {"en": 0.5, "fr": 0.5}, budget_tokens=20000)
           .toPandas().set_index("stratum"))
    rates = {s: float(mix.loc[s, "sample_rate"]) for s in mix.index}
    kept = stratified_sample(df, rates, seed=11).toPandas()
    kept_tokens = kept.groupby("lang").size() * 50
    # each stratum lands within 25% of its 10k-token allocation
    assert abs(kept_tokens["en"] - 10000) < 2500
    assert abs(kept_tokens["fr"] - 10000) < 2500


def test_boilerplate_flagging_and_strip(spark):
    from quickwit_spark.pipeline.filtering import (boilerplate_lines,
                                                   strip_boilerplate)
    banner = "ALL RIGHTS RESERVED"
    rows = [(i, f"unique body {i}\n{banner}\nmore text {i}"
             if i < 5 else f"clean doc {i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flagged = boilerplate_lines(df, min_docs=3).toPandas()
    assert list(flagged["line"]) == [banner]
    assert int(flagged["n_docs"].iloc[0]) == 5
    out = (strip_boilerplate(df, min_docs=3)
           .toPandas().set_index("doc_id").sort_index())
    # banner removed, order of remaining lines preserved
    assert out.loc[0, "text"] == "unique body 0\nmore text 0"
    assert int(out.loc[0, "n_removed"]) == 1
    # untouched docs round-trip with zero removals
    assert out.loc[7, "text"] == "clean doc 7"
    assert int(out.loc[7, "n_removed"]) == 0


def test_strip_boilerplate_all_lines_removed(spark):
    from quickwit_spark.pipeline.filtering import strip_boilerplate
    rows = [(i, "spam line") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (strip_boilerplate(df, min_docs=3)
           .toPandas().set_index("doc_id"))
    assert (out["text"] == "").all()
    assert (out["n_removed"] == 1).all()
