"""Kneser-Ney bigram LM: training against an independent replay,
probability-mass sanity, and document scoring semantics."""

import math

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.lm import (
    lm_score,
    train_bigram_lm,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _naive_kn(texts, D=0.75):
    """Independent interpolated-KN replay from raw bigram counts."""
    c = {}
    for t in texts:
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            c[(a, b)] = c.get((a, b), 0) + 1
    ctot, n1fwd, n1back = {}, {}, {}
    for (a, b), n in c.items():
        ctot[a] = ctot.get(a, 0) + n
        n1fwd[a] = n1fwd.get(a, 0) + 1
        n1back[b] = n1back.get(b, 0) + 1
    T = len(c)
    out = {}
    for (a, b), n in c.items():
        lam = D * n1fwd[a] / ctot[a]
        p = max(n - D, 0) / ctot[a] + lam * (n1back[b] / T)
        out[(a, b)] = round(math.log10(p), 6)
    return out


def test_train_bigram_lm_matches_replay(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
    ]
    lm = train_bigram_lm(_docs(spark, texts))
    got = {
        (r["w1"], r["w2"]): r["logp"] for r in lm["bigram"].collect()
    }
    assert got == pytest.approx(_naive_kn(texts), abs=1e-9)


def test_bigram_lm_probability_mass_sums_to_one(spark):
    """For each context w1: sum over SEEN w2 of P(w2|w1) plus
    lam(w1) * (unseen continuation mass) equals 1."""
    texts = ["a b a c a b", "b c b a"]
    lm = train_bigram_lm(_docs(spark, texts))
    bi = [
        (r["w1"], r["w2"], 10 ** r["logp"])
        for r in lm["bigram"].collect()
    ]
    lam = {r["w1"]: 10 ** r["loglam"] for r in lm["backoff"].collect()}
    cont = {r["w2"]: 10 ** r["logcont"] for r in lm["cont"].collect()}
    assert sum(cont.values()) == pytest.approx(1.0, abs=1e-4)
    for w1 in lam:
        seen = {w2 for a, w2, _ in bi if a == w1}
        mass = sum(p for a, _, p in bi if a == w1)
        mass += lam[w1] * sum(
            pc for w2, pc in cont.items() if w2 not in seen
        )
        assert mass == pytest.approx(1.0, abs=1e-4), w1


def test_lm_score_orders_fluent_above_garbage(spark):
    train = _docs(spark, ["the cat sat on the mat"] * 5
                  + ["the dog sat on the rug"] * 5)
    lm = train_bigram_lm(train)
    eval_docs = spark.createDataFrame(
        [
            (0, "the cat sat on the rug"),     # in-distribution
            (1, "rug the on sat dog mat"),     # shuffled garbage
            (2, "zz qq totally unseen words"), # OOV -> floor
            (3, "one"),                        # too short to score
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp10"])
        for r in lm_score(eval_docs, lm).collect()
    }
    assert got[0][1] > got[1][1] > got[2][1]
    assert got[2][1] == -7.0            # every bigram floored
    assert got[3] == (0, None)          # <2 tokens: unscored, not dropped
    assert got[0][0] == 5


def test_train_bigram_lm_rejects_bad_discount_and_empty(spark):
    with pytest.raises(ValueError, match="discount"):
        train_bigram_lm(_docs(spark, ["a b"]), discount=1.5)
    lm = train_bigram_lm(_docs(spark, ["solo"]))  # no bigrams at all
    assert lm["bigram"].count() == 0


def test_lm_score_runs_stream_static(spark):
    """lm_score is a stateless projection + stream-static joins against
    the trained tables, so it compiles unchanged onto a streaming
    DataFrame (the streaming_materialize discipline) and produces the
    batch scores."""
    import tempfile

    train = _docs(spark, ["the cat sat on the mat"] * 3
                  + ["the dog sat on the rug"] * 3)
    lm = train_bigram_lm(train)
    eval_rows = [(0, "the cat sat on the rug"), (1, "zz qq unseen here")]
    batch = spark.createDataFrame(eval_rows, "doc_id bigint, text string")
    want = {(r["doc_id"], r["n_bigrams"], r["avg_logp10"])
            for r in lm_score(batch, lm).collect()}

    with tempfile.TemporaryDirectory() as d:
        batch.coalesce(1).write.parquet(f"{d}/src")
        stream = spark.readStream.schema(batch.schema).parquet(f"{d}/src")
        out = lm_score(stream, lm)
        assert out.isStreaming
        sq = (
            out.writeStream.format("memory").queryName("lm_stream_test")
            .outputMode("complete")  # streaming agg by doc_id
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True).start()
        )
        sq.awaitTermination(120)
        got = {
            (r["doc_id"], r["n_bigrams"], r["avg_logp10"])
            for r in spark.sql("SELECT * FROM lm_stream_test").collect()
        }
    assert got == want


def test_collocations_rank_fused_phrase(spark):
    import math

    from biomedical_data_integration_spark.operators.lm import collocations

    # "san francisco" always co-occurs; "the cat/dog/sun" disperses "the"
    docs = []
    for i in range(10):
        docs.append((i, "san francisco is near the cat and the dog and the sun"))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = collocations(df, min_count=5, top_k=5).collect()
    # "san francisco" and "francisco is" are both PERFECT collocations
    # (c12 == c1 == c2): npmi == 1, tie broken alphabetically on w1
    perfect = [(r["w1"], r["w2"]) for r in out if r["npmi"] == 1.0]
    assert ("san", "francisco") in perfect
    assert out[0]["w1"] == "francisco"  # alphabetical tiebreak
    sf = next(r for r in out if (r["w1"], r["w2"]) == ("san", "francisco"))
    assert sf["n12"] == 10
    # perfect collocation: c12 == c1 == c2 -> pmi = ln(N/c12)
    n_total = 10 * 11  # 11 bigrams per doc
    assert abs(sf["pmi"] - math.log(n_total / 10)) < 1e-5
    # min_count gate: nothing below 5 appears
    assert all(r["n12"] >= 5 for r in out)


def test_collocations_empty_corpus(spark):
    from biomedical_data_integration_spark.operators.lm import collocations

    df = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
    assert collocations(df).count() == 0
