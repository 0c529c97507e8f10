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
