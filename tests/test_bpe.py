"""BPE tokenizer training: word counts, pair stats, merge learning,
and encoding — each checked against independent replays."""

import pytest
from pyspark.sql import functions as F

from biomedical_data_integration_spark.operators.bpe import (
    encode_bpe,
    pair_stats,
    train_bpe,
    word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _naive_train(wc_rows, num_merges, min_pair_count=2):
    """Independent textbook BPE replay (dict of word->count)."""
    vocab = {w: (list(w), n) for w, n in wc_rows}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, n in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _n = best
        for w, (syms, n) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, n)
        merges.append((a, b))
    return merges


def test_word_counts_and_pair_stats(spark):
    df = _docs(spark, ["aba aba cab", "Aba  cab", "x"])
    wc = {r["word"]: r["n_words"] for r in word_counts(df).collect()}
    assert wc == {"aba": 3, "cab": 2, "x": 1}

    ps = {
        r["pair"]: r["pair_count"]
        for r in pair_stats(word_counts(df)).collect()
    }
    # aba x3 -> ab, ba ; cab x2 -> ca, ab ; x contributes nothing
    assert ps == {"ab": 5, "ba": 3, "ca": 2}


def test_train_bpe_matches_naive_replay(spark):
    texts = [
        "low low low low low",
        "lower lower",
        "newest newest newest newest newest newest",
        "widest widest widest",
    ]
    df = _docs(spark, texts)
    wc = word_counts(df)
    got = train_bpe(wc, num_merges=6, min_pair_count=2)
    expected = _naive_train(
        [(r["word"], r["n_words"]) for r in wc.collect()], 6, 2
    )
    assert got == expected
    # sanity: the classic Sennrich corpus learns 'es' then 'est' early
    assert ("e", "s") == got[0] and ("es", "t") == got[1]


def test_train_bpe_tie_breaks_lexicographically(spark):
    # "ab" and "cd" both appear exactly 3 times; 'ab' < 'cd'
    df = _docs(spark, ["ab ab ab cd cd cd"])
    got = train_bpe(word_counts(df), num_merges=2)
    assert got == [("a", "b"), ("c", "d")]


def test_train_bpe_min_count_stops_early(spark):
    df = _docs(spark, ["ab ab xz"])
    assert train_bpe(word_counts(df), num_merges=10, min_pair_count=3) == []


def test_train_bpe_max_words_truncates_by_frequency(spark):
    # with max_words=1 only 'aa' (count 2) survives -> only its pair learns
    df = _docs(spark, ["aa aa bc"])
    got = train_bpe(word_counts(df), num_merges=5, max_words=1,
                    min_pair_count=1)
    assert got == [("a", "a")]


def test_encode_bpe_round_trip_and_greedy_rank_order(spark):
    texts = ["newest widest lowest", "low lower"]
    df = _docs(spark, texts)
    merges = train_bpe(word_counts(df), num_merges=8, min_pair_count=1)
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in encode_bpe(df, merges).collect()
    }
    # pieces concatenate back to the original words, in order
    for i, t in enumerate(texts):
        words = t.split()
        pieces = out[i]
        rebuilt, buf = [], ""
        wi = 0
        for p in pieces:
            buf += p
            if buf == words[wi]:
                rebuilt.append(buf)
                buf, wi = "", wi + 1
        assert rebuilt == words and buf == ""
    # a word fully covered by merges collapses to one piece
    full = {p for p in out[1]}
    assert "low" in full


def test_encode_bpe_is_arrow_batched(spark):
    df = _docs(spark, ["some text here"])
    plan = (
        encode_bpe(df, [("h", "e")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_train_bpe_rejects_negative(spark):
    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(word_counts(df), num_merges=-1)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    min_size=1, max_size=12,
)


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=_words, n_merges=st.integers(min_value=0, max_value=8))
def test_bpe_properties_roundtrip_and_replay(spark, words, n_merges):
    """For arbitrary corpora: learned merges equal the naive textbook
    replay, and encoding always reconstructs the input exactly."""
    df = _docs(spark, [" ".join(words)])
    wc = word_counts(df)
    got = train_bpe(wc, num_merges=n_merges, min_pair_count=1)
    expected = _naive_train(
        [(r["word"], r["n_words"]) for r in wc.collect()],
        n_merges, min_pair_count=1,
    )
    assert got == expected
    pieces = encode_bpe(df, got).collect()[0]["bpe_tokens"]
    assert "".join(pieces) == "".join(words)


# ---------------------------------------------------------------------------
# unigram-LM trainer (round-10)
# ---------------------------------------------------------------------------


def _naive_unigram(word_counts_list, vocab_size, iters, pool, max_len):
    """Pure-python replay of train_unigram's hard-EM."""
    # candidates
    cand = {}
    for w, n in word_counts_list:
        if len(w) < 2:
            continue
        for l in range(2, max_len + 1):
            for s in range(0, len(w) - l + 1):
                p = w[s : s + l]
                cand[p] = cand.get(p, 0) + n
    pieces = [p for p, _ in sorted(cand.items(), key=lambda t: (-t[1], t[0]))[:pool]]

    def segment(word, ps):
        out, i = [], 0
        pset = set(ps)
        maxl = max((len(p) for p in ps), default=1)
        while i < len(word):
            best = None
            for l in range(min(maxl, len(word) - i), 1, -1):
                if word[i : i + l] in pset:
                    best = word[i : i + l]
                    break
            if best is None:
                i += 1
            else:
                out.append(best)
                i += len(best)
        return out

    usage = []
    for _ in range(iters):
        counts = {}
        for w, n in word_counts_list:
            for p in segment(w, pieces):
                counts[p] = counts.get(p, 0) + n
        usage = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:vocab_size]
        pieces = [p for p, _ in usage]
    return usage


def test_train_unigram_matches_naive_replay(spark):
    from biomedical_data_integration_spark.operators.bpe import train_unigram

    texts = [
        "low low low lowering lowered slowly slow",
        "newest newer news new knew renew",
        "value values valued evaluate",
    ]
    df = _docs(spark, texts)
    wc = word_counts(df)
    got = train_unigram(wc, vocab_size=10, iters=2, candidate_pool=30,
                        max_piece_len=5)
    want = _naive_unigram(
        [(r["word"], r["n_words"]) for r in wc.collect()],
        vocab_size=10, iters=2, pool=30, max_len=5,
    )
    assert got == want
    # prune keeps AT MOST vocab_size; zero-usage candidates drop out
    assert 0 < len(got) <= 10 and all(n >= 1 for _, n in got)


def test_unigram_candidates_whole_word_counted_once(spark):
    """Regression: Spark sequence(1, 0) DESCENDS, which double-counted
    pieces exactly as long as their word before the guard."""
    from biomedical_data_integration_spark.operators.bpe import (
        unigram_candidates,
    )

    df = _docs(spark, ["data data data"])
    got = {
        r["piece"]: r["piece_count"]
        for r in unigram_candidates(word_counts(df), max_piece_len=5).collect()
    }
    assert got["data"] == 3          # once per occurrence, not 3x
    assert got["dat"] == 3 and got["at"] == 3


def test_encode_unigram_pure_projection_and_logprobs(spark):
    from biomedical_data_integration_spark.operators.bpe import (
        encode_unigram,
        train_unigram,
        unigram_logprobs,
    )

    texts = ["low lower lowering", "new newest knew"]
    df = _docs(spark, texts)
    usage = train_unigram(word_counts(df), vocab_size=6, iters=2,
                          candidate_pool=20, max_piece_len=4)
    out = encode_unigram(df, usage)
    # pure expression: no python exec nodes in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    toks = {r["doc_id"]: r["unigram_tokens"] for r in out.collect()}
    pieces = {p for p, _ in usage}
    assert all(t in pieces for ts in toks.values() for t in ts)
    assert any(len(ts) > 0 for ts in toks.values())
    # quantized logprobs: integers, monotone in usage, sum-consistent
    lp = unigram_logprobs(usage)
    assert all(isinstance(q, int) and q < 0 for _, q in lp)
    ranked = sorted(usage, key=lambda t: (-t[1], t[0]))
    assert [p for p, _ in lp] == [p for p, _ in ranked]


def test_train_unigram_validation(spark):
    import pytest as _pytest

    from biomedical_data_integration_spark.operators.bpe import train_unigram

    wc = word_counts(_docs(spark, ["ab ab"]))
    with _pytest.raises(ValueError, match="vocab_size"):
        train_unigram(wc, vocab_size=0)
    with _pytest.raises(ValueError, match="candidate_pool"):
        train_unigram(wc, vocab_size=10, candidate_pool=5)
    with _pytest.raises(ValueError, match="iters"):
        train_unigram(wc, vocab_size=2, iters=0)


def test_segmentation_kernel_policy():
    from biomedical_data_integration_spark import planning

    assert planning.segmentation_kernel(40) == "literal"
    assert planning.segmentation_kernel(2_000) == "literal"
    assert planning.segmentation_kernel(2_001) == "join"
    assert planning.segmentation_kernel(5, limit=3) == "join"


def test_encode_unigram_join_kernel_parity(spark):
    """The broadcast-join segmentation kernel must emit BIT-EQUAL piece
    sequences to the literal fold on the same vocabulary — the two
    kernels are interchangeable behind planning.segmentation_kernel."""
    from biomedical_data_integration_spark.operators.bpe import (
        encode_unigram,
        train_unigram,
    )

    texts = [
        "low lower lowering lowest",
        "new newest knew renewal",
        "the theme there these",
        "",
        "zzz qqq",
    ]
    df = _docs(spark, texts)
    usage = train_unigram(word_counts(df), vocab_size=8, iters=2,
                          candidate_pool=30, max_piece_len=4)
    lit = encode_unigram(df, usage, kernel="literal").select(
        "doc_id", F.array_join("unigram_tokens", " ").alias("s")
    ).orderBy("doc_id").collect()
    jn = encode_unigram(df, usage, kernel="join").select(
        "doc_id", F.array_join("unigram_tokens", " ").alias("s")
    ).orderBy("doc_id").collect()
    assert lit == jn
    # empty documents still get a row with an empty sequence
    by_id = {r["doc_id"]: r["s"] for r in jn}
    assert by_id[3] == ""


def test_encode_unigram_routes_past_literal_limit(spark):
    """Past SEGMENT_LITERAL_LIMIT the default routing takes the join
    kernel (no ValueError); the pieces DataFrame form never collects."""
    from biomedical_data_integration_spark.operators.bpe import (
        encode_unigram,
        encode_unigram_join,
    )

    df = _docs(spark, ["abc abd bcd", "abc xyz"])
    big_usage = [("ab", 5), ("bc", 4)] + [
        (f"q{i:04d}", 1) for i in range(2_100)
    ]
    out = encode_unigram(df, big_usage)  # policy routes to join
    rows = {r["doc_id"]: r["unigram_tokens"] for r in out.collect()}
    assert rows[0] == ["ab", "ab", "bc"] and rows[1] == ["ab"]
    # literal kernel still refuses past its limit when forced
    with pytest.raises(ValueError, match="literal kernel"):
        encode_unigram(df, big_usage, kernel="literal")
    # DataFrame-vocabulary form (collect-free path)
    pieces = spark.createDataFrame([("ab",), ("bc",)], "piece string")
    out2 = encode_unigram_join(df, pieces)
    rows2 = {r["doc_id"]: r["unigram_tokens"] for r in out2.collect()}
    assert rows2 == rows


def test_encode_unigram_join_requires_id(spark):
    from biomedical_data_integration_spark.operators.bpe import (
        encode_unigram_join,
    )

    df = spark.createDataFrame([("abc",)], "text string")
    with pytest.raises(ValueError, match="id_col"):
        encode_unigram_join(df, [("ab", 1)])


def test_segment_words_join_longest_match_and_greedy(spark):
    """Longest match wins at each position; the cursor then RESUMES
    past the consumed piece (greedy, not all-positions): 'abcd' with
    pieces {ab, abc, cd} -> [abc] (abc beats ab at pos 1; pos 4 'd'
    has no match), never [ab, cd]."""
    from biomedical_data_integration_spark.operators.bpe import (
        segment_words_join,
    )

    words = spark.createDataFrame([("abcd",), ("xabcd",)], "word string")
    pieces = spark.createDataFrame(
        [("ab",), ("abc",), ("cd",)], "piece string"
    )
    got = {r["word"]: r["pieces"] for r in
           segment_words_join(words, pieces).collect()}
    assert got["abcd"] == ["abc"]
    # 'xabcd': pos1 'x' no match -> pos2 'abc' -> pos5 'd' no match
    assert got["xabcd"] == ["abc"]


def test_train_unigram_join_kernel_parity(spark):
    """The hard-EM trainer must learn the EXACT same vocabulary through
    the broadcast-join E-step as through the literal fold — kernel
    routing never changes the fit."""
    from biomedical_data_integration_spark.operators.bpe import (
        train_unigram,
    )

    wc = word_counts(
        _docs(spark, ["low lower lowering lowest", "new newest knew",
                      "the theme there these", "slow slower slowest"])
    ).localCheckpoint(eager=True)
    kw = dict(vocab_size=10, iters=2, candidate_pool=40, max_piece_len=4)
    lit = train_unigram(wc, kernel="literal", **kw)
    jn = train_unigram(wc, kernel="join", **kw)
    assert jn == lit


def test_save_load_vocab_roundtrip(spark):
    """save_vocab -> load_vocab restores the trainer's exact return
    value (counts and the (n_uses desc, piece asc) order)."""
    import os
    import tempfile

    from biomedical_data_integration_spark.operators.bpe import (
        load_vocab,
        save_vocab,
        train_unigram,
    )

    wc = word_counts(_docs(spark, ["low lower lowering", "new newest"]))
    usage = train_unigram(wc, vocab_size=8, iters=2, candidate_pool=30)
    path = os.path.join(tempfile.mkdtemp(), "vocab")
    save_vocab(spark, usage, path)
    assert load_vocab(spark, path) == usage


def test_bpe_merges_sidecar_round_trip_and_persisted_encode(spark):
    """save_merges/load_merges must restore the EXACT ordered merge
    list (rank is the model), and encode_bpe_persisted must encode
    bit-identically to the in-memory list."""
    import os
    import tempfile

    from biomedical_data_integration_spark.operators.bpe import (
        encode_bpe,
        encode_bpe_persisted,
        load_merges,
        save_merges,
        train_bpe,
        word_counts,
    )

    df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    merges = train_bpe(word_counts(df), num_merges=12, min_pair_count=2)
    assert merges
    path = os.path.join(tempfile.mkdtemp(), "merges")
    save_merges(spark, merges, path)
    assert load_merges(spark, path) == merges
    want = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in encode_bpe(df, merges).collect()
    }
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in encode_bpe_persisted(spark, df, path).collect()
    }
    assert got == want
