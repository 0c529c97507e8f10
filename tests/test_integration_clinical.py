"""End-to-end harmonization on the FIXTURES.md F4 clinical table shape:
match_schema -> match_values -> merge_mappings (+user override) ->
materialize_mapping, mirroring the reference's full-pipeline golden test
(tests/test_api.py:224-306)."""

import pytest

import biomedical_data_integration_spark as bdi


@pytest.fixture()
def clinical(spark):
    rows = [
        ("FIGO grade 1", "Stage IA", 38.88, 64.0, "White", "Hispanic or Latino", "Female"),
        ("FIGO grade 2", "Stage IB", 22.2, 58.0, "Black or African American", "Not-Hispanic or Latino", "Female"),
        ("FIGO grade 1", "Stage II", 31.4, 71.0, "Asian", "Not reported", "Female"),
    ]
    return spark.createDataFrame(
        rows,
        ["Histologic_Grade_FIGO", "FIGO_stage", "BMI", "Age", "Race", "Ethnicity", "Gender"],
    )


def test_clinical_schema_match_to_gdc(clinical):
    m = bdi.match_schema(
        clinical.select("Ethnicity", "FIGO_stage", "Race", "Gender"), "gdc",
        method="two_phase",
    )
    got = dict((r["source"], r["target"]) for r in m.collect())
    assert got["Ethnicity"] == "ethnicity"
    assert got["FIGO_stage"] == "figo_stage"
    assert got["Race"] == "race"
    assert got["Gender"] == "gender"


def test_clinical_numeric_columns_skipped_in_value_match(clinical):
    out = bdi.match_values(
        clinical, "gdc",
        [("BMI", "ethnicity"), ("Ethnicity", "ethnicity")],
        method="tfidf",
    )
    cols = {r["source_column"] for r in out.select("source_column").distinct().collect()}
    assert cols == {"Ethnicity"}  # BMI is numeric -> skipped (api.py:488-492)


def test_clinical_full_pipeline_with_user_override(clinical):
    # 1. value-match Ethnicity against the GDC vocabulary
    vmatches = bdi.match_values(
        clinical, "gdc", [("Ethnicity", "ethnicity")], method="tfidf"
    )
    rows = {r["source_value"]: r["target_value"] for r in vmatches.collect()}
    assert rows["Hispanic or Latino"] == "hispanic or latino"
    assert rows["Not-Hispanic or Latino"] == "not hispanic or latino"
    assert rows["Not reported"] == "not reported"

    # 2. build the plan: computed value mapping + user-owned extras
    value_map = [
        (r["source_value"], r["target_value"])
        for r in vmatches.collect()
        if r["target_value"] is not None
    ]
    plan = bdi.merge_mappings(
        [
            {"source": "Ethnicity", "target": "ethnicity", "matches": value_map},
            {"source": "FIGO_stage", "target": "figo_stage"},
        ],
        user_mappings=[
            {"source": "Gender", "target": "gender", "mapper": lambda v: v.lower()},
        ],
    )

    # 3. materialize -> harmonized table, user mapping first
    out = bdi.materialize_mapping(clinical, plan)
    assert out.columns == ["gender", "ethnicity", "figo_stage"]
    got = {tuple(r) for r in out.collect()}
    assert got == {
        ("female", "hispanic or latino", "Stage IA"),
        ("female", "not hispanic or latino", "Stage IB"),
        ("female", "not reported", "Stage II"),
    }


def test_clinical_top_matches_contains_expected(clinical):
    tm = bdi.top_matches(
        clinical.select("FIGO_stage"), target="gdc", top_k=5, method="ct_learning"
    )
    targets = [r["target"] for r in tm.collect()]
    assert "figo_stage" in targets


def test_training_data_pipeline_composition(spark, tmp_path):
    """The full corpus-preparation chain composes: mix (token budgets) ->
    bloom decontaminate -> line dedup -> chunk -> pack -> shard write.
    Verifies row/token conservation invariants at each stage."""
    from pyspark.sql import functions as F

    from biomedical_data_integration_spark.operators.dedup import (
        bloom_decontaminate,
    )
    from biomedical_data_integration_spark.operators.sampling import (
        mix_corpus_by_tokens,
    )
    from biomedical_data_integration_spark.operators.text import (
        chunk_documents,
        dedup_lines,
        pack_sequences,
    )
    from biomedical_data_integration_spark.sources.writers import (
        write_training_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    evalset = docs.where(F.col("doc_id") % 17 == 0)
    corpus = docs.where(F.col("doc_id") % 17 != 0)

    budgets = {f"src{i}": 1200 for i in range(20)}
    mixed = mix_corpus_by_tokens(corpus, budgets)
    n_mixed = mixed.count()
    assert 0 < n_mixed <= corpus.count()

    clean = bloom_decontaminate(mixed, evalset)
    n_clean = clean.count()
    assert n_clean <= n_mixed

    deduped = dedup_lines(clean)
    assert deduped.count() == n_clean  # row-preserving

    chunks = chunk_documents(deduped, text_col="text", id_col="id",
                             chunk_tokens=16, overlap=4)
    assert chunks.count() >= n_clean - deduped.where(
        F.length(F.trim("text")) == 0).count()

    packed = pack_sequences(deduped, text_col="text", id_col="id",
                            budget_tokens=64, buckets=4)
    assert packed.count() == n_clean

    out = str(tmp_path / "shards")
    manifest = write_training_shards(deduped, out, shard_tokens=2_000,
                                     text_col="text", id_col="id")
    assert sum(m["n_docs"] for m in manifest) == n_clean


def test_getting_started_example_runs(spark):
    """The shipped examples/getting-started.py walkthrough (the
    reference's getting-started.ipynb flow) must stay runnable."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "getting-started.py",
    )
    spec = importlib.util.spec_from_file_location("getting_started", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    harmonized = mod.run(spark)
    assert harmonized.columns == ["gender", "bmi", "ethnicity", "figo_stage"]
    got = {tuple(r) for r in harmonized.collect()}
    assert ("female", 38.88, "hispanic or latino", "Stage IA") in got


def test_view_value_matches_edit_roundtrip(spark, clinical):
    """edit=True returns an editor whose edited spec round-trips through
    merge_mappings -> materialize_mapping (the reference's editable
    Tabulator semantics, bdikit/api.py:291-330)."""
    vmatches = bdi.match_values(
        clinical, "gdc", [("Ethnicity", "ethnicity")], method="tfidf"
    )
    editor = bdi.view_value_matches(vmatches, edit=True)
    assert editor.groups() == [("Ethnicity", "ethnicity")]
    # the analyst overrides one computed match and drops another
    editor.set("Ethnicity", "ethnicity", "Not reported", "unknown")
    editor.drop("Ethnicity", "ethnicity", "Hispanic or Latino")
    spec = editor.to_mapping_spec()
    assert spec == [
        {
            "source": "Ethnicity",
            "target": "ethnicity",
            "matches": [
                ("Not reported", "unknown"),
                ("Not-Hispanic or Latino", "not hispanic or latino"),
            ],
        }
    ]
    plan = bdi.merge_mappings(spec)
    out = bdi.materialize_mapping(clinical, plan)
    got = {r["ethnicity"] for r in out.collect()}
    # dropped value passes through unmatched (null), override applied
    assert got == {"unknown", "not hispanic or latino", None}
    # unknown group errors loudly
    import pytest as _pytest

    with _pytest.raises(KeyError):
        editor.set("Race", "race", "x", "y")


def test_corpus_curation_example_runs(spark):
    """The shipped examples/corpus-curation.py pipeline walkthrough must
    stay runnable against the test corpus."""
    import importlib.util
    import os

    import pytest as _pytest

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        _pytest.skip("testdata not present")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "corpus-curation.py",
    )
    spec = importlib.util.spec_from_file_location("corpus_curation", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    packed = mod.run(spark, sf)
    assert packed.count() > 0
    assert {"bucket", "bin", "bin_offset"} <= set(packed.columns)
