"""CDC maintenance operators (upsert compaction, SCD2 history) and the
round-4 web-text operators (boilerplate removal, domain stats)."""

import datetime as dt

import pytest


def _ts(minute):
    # naive UTC: Spark collects timestamps as naive datetimes in the
    # session timezone (UTC in conftest)
    return dt.datetime(2026, 1, 1, 0, minute)


def test_upsert_snapshot_latest_wins(spark):
    from biomedical_data_integration_spark.operators.cdc import upsert_snapshot

    rows = [
        (1, "a", _ts(0), 10),
        (1, "b", _ts(5), 11),   # latest for key 1
        (2, "x", _ts(3), 12),
        (1, "c", _ts(5), 9),    # same ts as id 11 -> change id breaks tie
    ]
    df = spark.createDataFrame(
        rows, "key bigint, val string, ts timestamp, change_id bigint"
    )
    out = upsert_snapshot(df, ["key"], ["ts", "change_id"])
    got = {r["key"]: r["val"] for r in out.collect()}
    assert got == {1: "b", 2: "x"}  # id 11 > id 9 at the tied ts
    with pytest.raises(ValueError):
        upsert_snapshot(df, [], ["ts"])


def test_scd2_history_intervals(spark):
    from biomedical_data_integration_spark.operators.cdc import scd2_history

    rows = [
        (1, _ts(0), "bronze", 100),
        (1, _ts(10), "bronze", 101),  # unchanged -> same interval
        (1, _ts(20), "gold", 102),
        (1, _ts(30), "bronze", 103),  # back to bronze = NEW interval
        (2, _ts(5), "silver", 104),
    ]
    df = spark.createDataFrame(
        rows, "user bigint, ts timestamp, tier string, change_id bigint"
    )
    out = scd2_history(df, ["user"], "ts", ["tier"], tiebreak_col="change_id")
    u1 = sorted(
        [r for r in out.collect() if r["user"] == 1],
        key=lambda r: r["valid_from"],
    )
    assert [(r["tier"], r["n_changes"]) for r in u1] == [
        ("bronze", 2), ("gold", 1), ("bronze", 1)
    ]
    assert u1[0]["valid_from"] == _ts(0) and u1[0]["valid_to"] == _ts(20)
    assert u1[1]["valid_to"] == _ts(30)
    assert u1[2]["valid_to"] is None  # current interval stays open
    (u2,) = [r for r in out.collect() if r["user"] == 2]
    assert u2["valid_to"] is None and u2["n_changes"] == 1


def test_scd2_null_attrs_are_null_safe(spark):
    from biomedical_data_integration_spark.operators.cdc import scd2_history

    rows = [(1, _ts(0), None), (1, _ts(1), None), (1, _ts(2), "set")]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, a string")
    out = scd2_history(df, ["k"], "ts", ["a"])
    assert out.count() == 2  # two NULLs collapse into one interval


def test_remove_boilerplate_lines_cross_document(spark):
    from biomedical_data_integration_spark.operators.text import (
        remove_boilerplate_lines,
    )

    footer = "Copyright 2026 Example Corp"
    docs = [
        (1, f"unique alpha\n{footer}\ncontent one"),
        (2, f"{footer}\ncontent two"),
        (3, f"content three\n{footer.upper()} "),  # case/space variant
        (4, footer),  # all-boilerplate doc must SURVIVE with empty text
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(df, max_doc_frequency=2).collect()}
    assert len(out) == 4  # never drops rows
    assert out[1]["text"] == "unique alpha\ncontent one"
    assert out[2]["text"] == "content two"
    assert out[3]["text"] == "content three"
    assert out[4]["text"] == "" and out[4]["n_kept_lines"] == 0
    assert out[1]["n_lines"] == 3 and out[1]["n_kept_lines"] == 2
    # with the gate above the footer's doc frequency, nothing is removed
    loose = {r["doc_id"]: r["n_kept_lines"] for r in
             remove_boilerplate_lines(df, max_doc_frequency=4).collect()}
    assert loose[1] == 3


def test_url_domain_stats(spark):
    from biomedical_data_integration_spark.operators.text import (
        url_domain_stats,
    )

    docs = [
        (1, "see https://www.example.com/a and http://example.com/b?q=1"),
        (2, "also https://Example.COM and https://other.org/page"),
        (3, "no urls here"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["domain"]: (r["n_urls"], r["n_docs"])
           for r in url_domain_stats(df).collect()}
    assert got["example.com"] == (3, 2)  # www./case variants normalized
    assert got["other.org"] == (1, 1)
    assert set(got) == {"example.com", "other.org"}


def test_upsert_snapshot_delete_tombstones(spark):
    from biomedical_data_integration_spark.operators.cdc import (
        upsert_snapshot,
    )

    rows = [
        # key 1: insert, update, DELETE -> gone
        (1, 1, "u", "a"), (1, 2, "u", "b"), (1, 3, "d", None),
        # key 2: insert, DELETE, re-insert -> present with latest value
        (2, 1, "u", "x"), (2, 2, "d", None), (2, 3, "u", "y"),
        # key 3: plain upsert, null op -> present
        (3, 1, None, "z"),
    ]
    df = spark.createDataFrame(
        rows, "k bigint, ver bigint, op string, val string"
    )
    got = {
        r["k"]: r["val"]
        for r in upsert_snapshot(
            df, ["k"], ["ver"], op_col="op"
        ).collect()
    }
    assert got == {2: "y", 3: "z"}
    # without op_col the tombstones are ordinary rows (back-compat)
    plain = {
        r["k"]: r["val"]
        for r in upsert_snapshot(df, ["k"], ["ver"]).collect()
    }
    assert set(plain) == {1, 2, 3} and plain[1] is None


def test_table_diff_classifies_all_change_types(spark):
    from biomedical_data_integration_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "", 40.0), (5, "e", 50.0)],
        ["k", "s", "v"],
    )
    got = {r["k"]: r for r in table_diff(old, new, ["k"]).collect()}
    assert got[1]["change_type"] == "unchanged" and got[1]["changed_columns"] == []
    assert got[2]["change_type"] == "changed" and got[2]["changed_columns"] == ["s"]
    assert got[3]["change_type"] == "removed"
    assert got[5]["change_type"] == "added"
    # NULL -> '' is a CHANGE (null-tagged canonical form)
    assert got[4]["change_type"] == "changed" and got[4]["changed_columns"] == ["s"]


def test_table_diff_respects_compare_cols(spark):
    from biomedical_data_integration_spark.operators.cdc import table_diff

    old = spark.createDataFrame([(1, "a", 1.0)], ["k", "s", "v"])
    new = spark.createDataFrame([(1, "a", 9.0)], ["k", "s", "v"])
    got = table_diff(old, new, ["k"], compare_cols=["s"]).collect()[0]
    assert got["change_type"] == "unchanged"


def test_table_diff_validates_args(spark):
    import pytest

    from biomedical_data_integration_spark.operators.cdc import table_diff

    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        table_diff(df, df, [])
    with pytest.raises(ValueError):
        table_diff(df, df, ["k"])
