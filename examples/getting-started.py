"""Getting started with the PySpark harmonization engine.

Mirrors the reference's walkthrough (`bdi-kit`
``examples/getting-started.ipynb``): load a clinical table, match its
columns to the GDC standard, inspect domains, match cell values to the
GDC vocabulary, combine computed and user-owned mappings, and
materialize the harmonized table — all on Spark DataFrames.

Run:  python examples/getting-started.py
(any Spark master works; defaults to local[4])
"""

import os
import sys

from pyspark.sql import SparkSession

# allow running straight from a source checkout: python examples/getting-started.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import biomedical_data_integration_spark as bdi  # noqa: E402


def run(spark: SparkSession):
    """The walkthrough body; returns the harmonized DataFrame (so the
    test suite can smoke-run it on a shared session)."""
    # ------------------------------------------------------------------
    # 1. A clinical dataset (the reference walks through dou.csv; this is
    #    the same shape — in practice: spark.read.csv("dou.csv", header=True)
    # ------------------------------------------------------------------
    dataset = spark.createDataFrame(
        [
            ("Endometrioid", "FIGO grade 1", "Stage IA", 38.88, 64.0,
             "White", "Hispanic or Latino", "Female"),
            ("Serous", "FIGO grade 2", "Stage IB", 22.2, 58.0,
             "Black or African American", "Not-Hispanic or Latino", "Female"),
            ("Clear cell", "FIGO grade 1", "Stage II", 31.4, 71.0,
             "Asian", "Not reported", "Female"),
        ],
        ["Histologic_type", "Histologic_Grade_FIGO", "FIGO_stage", "BMI",
         "Age", "Race", "Ethnicity", "Gender"],
    )
    dataset.show(truncate=False)

    # ------------------------------------------------------------------
    # 2. Schema matching: which GDC column does each source column map to?
    #    (reference: bdi.match_schema(dataset, target="gdc",
    #    method="two_phase"))
    # ------------------------------------------------------------------
    column_mappings = bdi.match_schema(
        dataset.select("Ethnicity", "FIGO_stage", "Race", "Gender"),
        target="gdc",
        method="two_phase",
    )
    print("column mappings:")
    column_mappings.show(truncate=False)

    # ------------------------------------------------------------------
    # 3. Candidate exploration: top-k target columns for one source column
    #    and the value domains on both sides.
    # ------------------------------------------------------------------
    print("top matches for Histologic_type:")
    bdi.top_matches(dataset, columns=["Histologic_type"], target="gdc",
                    top_k=5).show(truncate=False)
    print("source domain:")
    bdi.preview_domain(dataset, "Histologic_type").show(truncate=False)
    print("GDC domain (first rows):")
    bdi.preview_domain("gdc", "ethnicity").show(5, truncate=False)

    # ------------------------------------------------------------------
    # 4. Value matching: map source cell values into the GDC vocabulary.
    #    (reference: bdi.match_values(..., method="tfidf"); numeric
    #    columns are skipped automatically)
    # ------------------------------------------------------------------
    ethnicity_vmap = bdi.match_values(
        dataset, "gdc", [("Ethnicity", "ethnicity")], method="tfidf"
    )
    print("value matches for Ethnicity -> ethnicity:")
    ethnicity_vmap.show(truncate=False)

    # keep only confident matches, like the notebook's
    # `race_vmap[race_vmap.similarity >= 1.0]`
    confident = ethnicity_vmap.where("similarity >= 0.5")

    # ------------------------------------------------------------------
    # 5. Build the harmonization plan: computed mappings + user overrides
    #    (user mappings take precedence; duplicates are rejected).
    # ------------------------------------------------------------------
    value_map = [
        (r["source_value"], r["target_value"])
        for r in confident.collect()
        if r["target_value"] is not None
    ]
    plan = bdi.merge_mappings(
        [
            {"source": "Ethnicity", "target": "ethnicity",
             "matches": value_map},
            {"source": "FIGO_stage", "target": "figo_stage"},
        ],
        user_mappings=[
            # mapper can be a plain Python function (reference:
            # FunctionValueMapper semantics — element-wise, null passthrough)
            {"source": "Gender", "target": "gender",
             "mapper": lambda v: v.lower()},
            # rename-only mapping: source + target is enough
            {"source": "BMI", "target": "bmi"},
        ],
    )

    # ------------------------------------------------------------------
    # 6. Materialize: ONE narrow projection builds the harmonized table.
    # ------------------------------------------------------------------
    harmonized = bdi.materialize_mapping(dataset, plan)
    print("harmonized dataset:")
    harmonized.show(truncate=False)
    return harmonized


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("bdi-getting-started")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    run(spark)
    spark.stop()


if __name__ == "__main__":
    main()
