"""Deterministic sampling / splitting operators (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "key")


def test_deterministic_sample_reproducible_and_uniform(ids):
    a = sorted(r["key"] for r in deterministic_sample(ids, "key", 0.25).collect())
    b = sorted(r["key"] for r in deterministic_sample(ids, "key", 0.25).collect())
    assert a == b
    # ~25% within binomial noise (n=2000, sd~19)
    assert 380 < len(a) < 620
    # different salt -> different (mostly independent) draw
    c = sorted(
        r["key"] for r in deterministic_sample(ids, "key", 0.25, salt="other").collect()
    )
    assert a != c


def test_deterministic_sample_is_nested(ids):
    small = {r["key"] for r in deterministic_sample(ids, "key", 0.1).collect()}
    big = {r["key"] for r in deterministic_sample(ids, "key", 0.5).collect()}
    assert small <= big  # same hash, bigger threshold: supersets, no churn


def test_hash_split_partitions_everything(ids):
    out = hash_split(ids, "key", {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert sum(counts.values()) == 2000
    assert counts["train"] > 1400
    # stability: membership of a row never depends on the rest of the data
    sub = hash_split(ids.where(F.col("key") < 100), "key", {"train": 0.8, "valid": 0.1, "test": 0.1})
    full = {r["key"]: r["split"] for r in out.where(F.col("key") < 100).collect()}
    assert {r["key"]: r["split"] for r in sub.collect()} == full


def test_hash_split_validates_fractions(ids):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(ids, "key", {"a": 0.5, "b": 0.2})


def test_stratified_sample_per_stratum_fractions(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)], ["key", "lang"]
    )
    out = stratified_sample(df, "lang", "key", {"en": 0.5, "de": 0.05})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 400 < counts.get("en", 0) < 600
    assert 20 < counts.get("de", 0) < 90
    # unknown strata are dropped entirely
    out2 = stratified_sample(df, "lang", "key", {"fr": 1.0})
    assert out2.count() == 0


def test_hash_split_empty_splits_clear_error(ids):
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(ids, "key", {})


def test_stratified_sample_non_string_strata_keys(spark):
    """Float/int stratum keys must match natively (str() vs Spark's string
    cast disagree on e.g. 0.1 vs '0.1' formatting)."""
    df = spark.createDataFrame(
        [(i, i % 2 / 10.0) for i in range(1000)], ["key", "w"]
    )
    out = stratified_sample(df, "w", "key", {0.1: 1.0})
    assert out.count() == 500  # every 0.1-stratum row kept
    assert {r["w"] for r in out.select("w").distinct().collect()} == {0.1}


def test_stratified_sample_scalar_fraction(spark):
    df = spark.createDataFrame([(i, "x") for i in range(500)], ["key", "s"])
    n = stratified_sample(df, "s", "key", 0.2).count()
    assert 60 < n < 140


def test_mix_corpus_by_tokens_budgets(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        mix_corpus_by_tokens,
    )

    rows = []
    for i in range(200):
        src = f"s{i % 2}"
        rows.append((i, src, "tok " * 10))  # 10 tokens each
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    # s0: 1000 total tokens, budget 250 -> keep ~1/4; s1: over-budget ->
    # keep all; s2 absent from data; sX missing budget -> dropped
    out = mix_corpus_by_tokens(docs, {"s0": 250, "s1": 10_000})
    by_src = {r["source"]: r["count"]
              for r in out.groupBy("source").count().collect()}
    assert by_src["s1"] == 100           # under budget: keep everything
    assert 10 <= by_src.get("s0", 0) <= 45   # ~25 expected at fraction 0.25

    none_budgeted = mix_corpus_by_tokens(docs, {"zzz": 100})
    assert none_budgeted.count() == 0    # sources without budget drop

    # deterministic: same rows on re-run and under repartitioning
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"]
         for r in mix_corpus_by_tokens(
             docs.repartition(7), {"s0": 250, "s1": 10_000}).collect()}
    assert a == b


def test_temperature_mix_flattens_distribution(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        temperature_mix,
    )

    rows = []
    # big source: 90 docs x 10 tokens; small source: 10 docs x 10 tokens
    for i in range(90):
        rows.append((i, "big", "t " * 10))
    for i in range(90, 100):
        rows.append((i, "small", "t " * 10))
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")

    # alpha=0 -> uniform weights: each source gets budget/2 = 250 tokens;
    # small (100 tokens) passes whole, big (900) thins to ~250/900
    out = temperature_mix(df, total_budget=500, alpha=0.0)
    by_src = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert by_src.get("small") == 10  # under budget -> intact
    assert 0 < by_src.get("big", 0) < 90  # thinned

    # alpha=1 -> natural proportions: fractions equal across sources
    out1 = temperature_mix(df, total_budget=500, alpha=1.0)
    n1 = {r[0]: r[1] for r in out1.groupBy("source").count().collect()}
    # both sources thinned at the SAME fraction 500/1000
    assert 0 < n1.get("big", 0) < 90 and 0 < n1.get("small", 0) < 10


def test_temperature_mix_deterministic(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, f"s{i % 3}", "w " * (5 + i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    a = sorted(r["doc_id"] for r in temperature_mix(df, 100, 0.5).collect())
    b = sorted(r["doc_id"] for r in temperature_mix(df, 100, 0.5).collect())
    assert a == b


def test_temperature_mix_rejects_negative_alpha(spark):
    import pytest as _pytest
    from biomedical_data_integration_spark.operators.sampling import (
        temperature_mix,
    )

    df = spark.createDataFrame(
        [(1, "a", "x")], "doc_id bigint, source string, text string"
    )
    with _pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, 10, alpha=-0.1)


def test_group_kfold_groups_never_straddle(spark):
    from biomedical_data_integration_spark.operators.sampling import group_kfold

    rows = [(i, f"g{i % 7}") for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, grp string")
    out = group_kfold(df, "grp", n_folds=3)
    per_group = (
        out.groupBy("grp").agg(F.count_distinct("fold").alias("nf")).collect()
    )
    assert all(r["nf"] == 1 for r in per_group)
    folds = {r["fold"] for r in out.collect()}
    assert folds <= {0, 1, 2} and len(folds) >= 2


def test_group_kfold_rejects_bad_folds(spark):
    import pytest as _pytest
    from biomedical_data_integration_spark.operators.sampling import group_kfold

    df = spark.createDataFrame([(1, "a")], "id bigint, grp string")
    with _pytest.raises(ValueError, match="n_folds"):
        group_kfold(df, "grp", n_folds=1)


def test_balance_classes_downsamples_majority(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        balance_classes,
    )

    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "small") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id bigint, label string")
    out = balance_classes(df, "label", "id")
    sizes = {r["label"]: r["n"] for r in
             out.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert sizes["small"] == 50  # smallest class intact
    # expected 50 survivors of 900 at fraction 50/900; hash gate is
    # binomial around the target
    assert 25 <= sizes["big"] <= 90
    # deterministic
    again = balance_classes(df, "label", "id")
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )


def test_cap_per_group_deterministic_and_bounded(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        cap_per_group,
    )

    rows = [(i, "big" if i < 47 else "small") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = cap_per_group(df, "source", k=5)
    per = {}
    for r in out.collect():
        per.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(per["big"]) == 5     # capped
    assert len(per["small"]) == 3   # under the cap: untouched
    again = cap_per_group(df, "source", k=5).collect()
    assert {(r["doc_id"], r["source"]) for r in again} == {
        (d, s) for s, ds in per.items() for d in ds
    }  # pure function of (salt, key): identical draw every run
    # survivors are stable under growth: adding rows to OTHER groups
    # never changes big's picks
    grown = df.union(
        spark.createDataFrame([(100 + i, "new") for i in range(20)],
                              "doc_id bigint, source string")
    )
    per2 = {r["doc_id"] for r in cap_per_group(grown, "source", k=5).collect()
            if r["source"] == "big"}
    assert per2 == per["big"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cap_per_group(df, "source", k=0)


def test_weighted_sample_favors_heavy_rows_and_is_deterministic(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 1000.0 if i < 10 else 0.001) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    got = weighted_sample(df, k=10, weight_col="w").collect()
    ids = {r["doc_id"] for r in got}
    # the 10 heavy rows dominate the draw overwhelmingly
    assert len(ids & set(range(10))) >= 9
    # deterministic under repartition
    again = {
        r["doc_id"]
        for r in weighted_sample(
            df.repartition(7), k=10, weight_col="w"
        ).collect()
    }
    assert again == ids


def test_weighted_sample_excludes_nonpositive_and_validates(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -5.0), (4, None)],
        "doc_id bigint, w double",
    )
    got = weighted_sample(df, k=10, weight_col="w").collect()
    assert [r["doc_id"] for r in got] == [1]
    with _pytest.raises(ValueError, match="k"):
        weighted_sample(df, k=0, weight_col="w")


def test_weighted_sample_per_group_quotas_and_consistency(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_per_group,
    )

    rows = [(i, "g%d" % (i % 3), 1.0 + (i % 7)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id bigint, g string, w double")
    out = weighted_sample_per_group(df, "g", k=5, weight_col="w").collect()
    from collections import Counter
    per = Counter(r["g"] for r in out)
    assert per == {"g0": 5, "g1": 5, "g2": 5}
    # same salt => identical draw keys as the global sampler
    glob = {r["doc_id"]: r["draw_key"]
            for r in weighted_sample(df, k=90, weight_col="w").collect()}
    assert all(glob[r["doc_id"]] == r["draw_key"] for r in out)
    # small groups keep everything
    small = spark.createDataFrame(
        [(1, "x", 1.0), (2, "x", 2.0)], "doc_id bigint, g string, w double"
    )
    assert weighted_sample_per_group(small, "g", 5, "w").count() == 2


# ---------------------------------------------------------------------------
# UniMax language-budget allocation (Chung et al., ICLR 2023)
# ---------------------------------------------------------------------------


def _unimax_corpus(spark):
    rows = []
    did = 0
    for lang, n_docs, words in [("en", 40, 20), ("de", 10, 20), ("yo", 2, 20)]:
        for _ in range(n_docs):
            rows.append((did, lang, " ".join(["w"] * words)))
            did += 1
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_unimax_waterfill_matches_sequential_reference(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        unimax_allocation,
    )

    df = _unimax_corpus(spark)
    # tokens: en 800, de 200, yo 40; capacities at 4 epochs: 3200/800/160
    out = {
        r["lang"]: r
        for r in unimax_allocation(df, total_budget=1000, max_epochs=4).collect()
    }
    # sequential waterfilling reference: ascending capacity
    # yo: 160*3 <= 1000 -> capped at 160; de: 800*2 <= 840 -> wait 800*2=1600 > 840
    #   -> de and en split (1000-160)/2 = 420 each
    assert out["yo"]["capped"] and out["yo"]["alloc_tokens"] == 160.0
    assert not out["de"]["capped"] and out["de"]["alloc_tokens"] == 420.0
    assert not out["en"]["capped"] and out["en"]["alloc_tokens"] == 420.0
    # allocations exhaust the budget exactly
    assert sum(r["alloc_tokens"] for r in out.values()) == 1000.0
    # epochs: yo trains 4 epochs (its cap), de 2.1, en 0.525
    assert out["yo"]["epochs"] == 4.0
    assert out["de"]["epochs"] == 2.1
    assert out["en"]["epochs"] == 0.525


def test_unimax_budget_exceeds_all_capacities(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        unimax_allocation,
    )

    df = _unimax_corpus(spark)
    out = {
        r["lang"]: r
        for r in unimax_allocation(
            df, total_budget=10_000_000, max_epochs=2
        ).collect()
    }
    # everything capped at 2 epochs; budget not exhausted
    assert all(r["capped"] for r in out.values())
    for lang, tokens in [("en", 800), ("de", 200), ("yo", 40)]:
        assert out[lang]["alloc_tokens"] == 2.0 * tokens
        assert out[lang]["epochs"] == 2.0


def test_unimax_tiny_budget_is_uniform(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        unimax_allocation,
    )

    df = _unimax_corpus(spark)
    out = {
        r["lang"]: r
        for r in unimax_allocation(df, total_budget=90, max_epochs=1).collect()
    }
    # 90 < 3 * min-capacity(40): nobody capped, uniform 30 each
    assert not any(r["capped"] for r in out.values())
    assert all(r["alloc_tokens"] == 30.0 for r in out.values())


def test_unimax_validates(spark):
    import pytest

    from biomedical_data_integration_spark.operators.sampling import (
        unimax_allocation,
    )

    df = _unimax_corpus(spark)
    with pytest.raises(ValueError, match="total_budget"):
        unimax_allocation(df, total_budget=0)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_allocation(df, total_budget=10, max_epochs=0)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_allocation(df, total_budget=10, max_epochs=1.5)


def _maxcov_docs(spark):
    # doc 1 covers {a b c d}, doc 2 {c d e}, doc 3 {e f}, doc 4 {a b}
    # greedy: 1 (gain 4), then 3 (gain 2: e,f) beats 2 (gain 1: e)
    rows = [
        (1, "a b c d"),
        (2, "c d e"),
        (3, "e f"),
        (4, "a b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_max_coverage_greedy_golden(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        max_coverage_select,
    )

    out = max_coverage_select(_maxcov_docs(spark), k=3).orderBy("rank").collect()
    assert [(r["rank"], r["doc_id"], r["gain"], r["covered_total"]) for r in out] == [
        (1, 1, 4, 4),
        (2, 3, 2, 6),
    ]  # rank 3 never emitted: every remaining doc has zero marginal gain


def test_max_coverage_tiebreak_lowest_id(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        max_coverage_select,
    )

    df = spark.createDataFrame(
        [(7, "x y"), (3, "p q"), (9, "p x")], ["doc_id", "text"]
    )
    out = max_coverage_select(df, k=1).collect()
    assert out[0]["doc_id"] == 3  # all gains tie at 2 -> lowest id


def test_max_coverage_ngram_units(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        max_coverage_select,
    )

    # same unigram vocab everywhere; only bigrams discriminate
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "b a b a b"), (3, "a a a a")],
        ["doc_id", "text"],
    )
    uni = max_coverage_select(df, k=3, ngram_n=1).collect()
    assert len(uni) == 1  # token coverage saturates at one pick
    bi = max_coverage_select(df, k=3, ngram_n=2).orderBy("rank").collect()
    # doc 1 bigrams {a b, b a}; doc 2 {b a, a b}; doc 3 {a a}
    assert [(r["doc_id"], r["gain"]) for r in bi] == [(1, 2), (3, 1)]


def test_max_coverage_submodular_gains_nonincreasing(spark):
    """Greedy marginal gains of a coverage objective are non-increasing
    in rank (submodularity) — checked on real testdata documents."""
    from biomedical_data_integration_spark.operators.sampling import (
        max_coverage_select,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = max_coverage_select(docs, k=5, ngram_n=2).orderBy("rank").collect()
    gains = [r["gain"] for r in out]
    assert len(gains) == 5
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    assert out[-1]["covered_total"] == sum(gains)


def test_max_coverage_validation(spark):
    from biomedical_data_integration_spark.operators.sampling import (
        max_coverage_select,
    )

    df = _maxcov_docs(spark)
    with pytest.raises(ValueError, match="k must be"):
        max_coverage_select(df, k=0)
    with pytest.raises(ValueError, match="ngram_n"):
        max_coverage_select(df, k=2, ngram_n=0)


def test_max_coverage_null_and_empty_text_contribute_nothing(spark):
    """NULL/empty-text docs must never be selected: the word_ngrams
    short-doc fallback would otherwise give each a phantom NULL/''
    unit that never joins the covered set ('maximally novel' garbage)."""
    from biomedical_data_integration_spark.operators.sampling import (
        max_coverage_select,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, ""), (4, "   ")],
        "doc_id bigint, text string",
    )
    for n in (1, 2):
        out = max_coverage_select(df, k=4, ngram_n=n).collect()
        assert [r["doc_id"] for r in out] == [1]


def test_data_selection_flagship_plan_and_composition(spark):
    """The selection capstone's DSIR gate compiles to a distributed
    top-N (TakeOrderedAndProject), never an unpartitioned ordered
    window; and its picks are exactly max_coverage over the gate's
    survivor set (composition == stages run by hand)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.sampling import (
        dsir_weights,
        max_coverage_select,
    )

    sf = "/root/testdata/sf0.001"
    df = entry.queries()["data_selection_end_to_end"](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan.lower()

    got = [(r["rank"], r["doc_id"], r["gain"]) for r in df.orderBy("rank").collect()]

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    w = dsir_weights(
        docs, docs.where(F.col("lang") == "en"),
        n_buckets=entry.DSIR_BUCKETS, smoothing=entry.DSIR_SMOOTH,
    ).where("n_tokens > 0")
    # the gate sub-plan (pre-pin in the query, so asserted here on the
    # same expression): global top-N must be TakeOrderedAndProject
    gate = w.orderBy(F.desc("avg_log_ratio"), "doc_id").limit(entry.DSEL_TOP_N)
    gate_plan = gate._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in gate_plan
    keep = [r["doc_id"] for r in gate.collect()]
    by_hand = max_coverage_select(
        docs.where(F.col("doc_id").isin(keep)),
        k=entry.DSEL_K, ngram_n=entry.DSEL_NGRAM,
    )
    want = [
        (r["rank"], r["doc_id"], r["gain"])
        for r in by_hand.orderBy("rank").collect()
    ]
    assert got == want
