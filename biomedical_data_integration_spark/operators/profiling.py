"""Data-profiling operators: per-column table profiles and schema drift.

The reference's closest surface is ``preview_domain`` (one column at a
time, ``bdikit/api.py:495-552``); real harmonization work starts with a
whole-table profile and, over time, with detecting how a source drifted
from the version a mapping was built against. Both operators are engine
extensions in that spirit.

Scale shape: both profile passes are ONE native unpivot (single Expand
over one scan) feeding a per-column aggregation — never a per-column
query loop, never a driver-side row pull; outputs are column-count-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biomedical_data_integration_spark import config


def profile_table(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Per-column profile: (column, dtype, n_rows, n_nulls, n_distinct,
    min_value, max_value).

    One unpivot scan + one groupBy — adding columns widens the Expand, it
    does not add passes. Values are profiled in their STRING form so one
    output schema covers every column type (min/max are therefore
    lexicographic — fine for domain eyeballing, documented). Null counts
    come from ``n_rows - count(value)`` so the unpivot can keep its
    null-dropping filter off. ``exact_distinct=False`` switches to
    ``approx_count_distinct`` — the 100 TB default, same plan shape.
    """
    cols = df.columns
    dtypes = dict(df.dtypes)
    n_rows = df.count()  # one cheap scalar job; rides the plan as a literal
    long = df.select(
        [F.col(c).cast("string").alias(c) for c in cols]
    ).unpivot([], cols, "column", "value")
    distinct_agg = (
        F.countDistinct("value")
        if exact_distinct
        else F.approx_count_distinct("value")
    )
    prof = long.groupBy("column").agg(
        F.count("value").alias("__nonnull"),
        distinct_agg.alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    dtype_expr = F.coalesce(
        *[
            F.when(F.col("column") == c, F.lit(dtypes[c]))
            for c in cols
        ]
    )
    return prof.select(
        "column",
        dtype_expr.alias("dtype"),
        F.lit(n_rows).cast("bigint").alias("n_rows"),
        (F.lit(n_rows) - F.col("__nonnull")).cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint"),
        "min_value",
        "max_value",
    )


def detect_schema_drift(
    old: DataFrame,
    new: DataFrame,
    domain_threshold: float = 0.5,
) -> DataFrame:
    """Structural + domain drift between two versions of a table — the
    check that tells you an existing harmonization mapping needs review.

    Output: (column, status, old_type, new_type, domain_jaccard) where
    status is one of ``added`` / ``removed`` / ``type_changed`` /
    ``domain_drift`` / ``stable``. Structural comparison is driver-side
    (schemas are metadata); domain comparison is ONE distributed job —
    both tables' shared string columns unpivot to (column, value) long
    forms whose per-column distinct-value Jaccard feeds the drift flag
    (``jaccard < domain_threshold`` on a shared column ⇒ ``domain_drift``).
    """
    from biomedical_data_integration_spark.operators.schema_matching import (
        _unpivot_strings,
    )

    old_types = dict(old.dtypes)
    new_types = dict(new.dtypes)
    spark = old.sparkSession

    structural = []
    for c in old.columns:
        if c not in new_types:
            structural.append((c, "removed", old_types[c], None))
    for c in new.columns:
        if c not in old_types:
            structural.append((c, "added", None, new_types[c]))
    shared = [c for c in old.columns if c in new_types]
    typed = []
    for c in shared:
        if old_types[c] != new_types[c]:
            structural.append((c, "type_changed", old_types[c], new_types[c]))
        else:
            typed.append(c)

    shared_str = [c for c in typed if old_types[c] == "string"]
    base = spark.createDataFrame(
        structural + [(c, None, old_types[c], new_types[c]) for c in typed],
        "column string, status string, old_type string, new_type string",
    )
    if shared_str:
        o = _unpivot_strings(old.select(*shared_str), "column", "val")
        n = _unpivot_strings(new.select(*shared_str), "column", "val")
        inter = (
            o.join(n, ["column", "val"])
            .groupBy("column")
            .agg(F.count("*").alias("__i"))
        )
        sizes_o = o.groupBy("column").agg(F.count("*").alias("__no"))
        sizes_n = n.groupBy("column").agg(F.count("*").alias("__nn"))
        jac = (
            sizes_o.join(sizes_n, "column", "outer")
            .join(inter, "column", "left")
            .select(
                "column",
                F.round(
                    F.coalesce(F.col("__i"), F.lit(0))
                    / (
                        F.coalesce(F.col("__no"), F.lit(0))
                        + F.coalesce(F.col("__nn"), F.lit(0))
                        - F.coalesce(F.col("__i"), F.lit(0))
                    ),
                    config.SIMILARITY_SCALE,
                ).alias("domain_jaccard"),
            )
        )
        out = base.join(F.broadcast(jac), "column", "left")
    else:
        out = base.withColumn("domain_jaccard", F.lit(None).cast("double"))
    status = F.coalesce(
        F.col("status"),
        F.when(
            F.col("domain_jaccard").isNotNull()
            & (F.col("domain_jaccard") < domain_threshold),
            F.lit("domain_drift"),
        ).otherwise(F.lit("stable")),
    )
    return out.select(
        "column", status.alias("status"), "old_type", "new_type",
        "domain_jaccard",
    )


def validate_table(df: DataFrame, rules) -> DataFrame:
    """Data-quality expectation checking: evaluate declarative rules over
    a table in ONE aggregation pass and return per-rule violation counts
    — the generalized form of the reference's source-column existence
    validation (``bdikit/api.py:721-726``), extended to the expectation
    suites a production ingest runs before materialization.

    ``rules`` is a list of dicts with ``name`` and ``type``:

    - ``{"name", "type": "not_null", "column"}``
    - ``{"name", "type": "unique", "column"}`` — violations = rows beyond
      the first per duplicate value (``count - count_distinct``; null
      values are not counted as duplicates of each other)
    - ``{"name", "type": "in_set", "column", "values": [...]}``
    - ``{"name", "type": "range", "column", "min"?, "max"?}``
    - ``{"name", "type": "expression", "expr": "<bool SQL>"}`` —
      violations = rows where the expression is NOT true

    Every rule compiles to a conditional aggregate in the SAME agg node
    (one scan, map-side combinable; ``unique`` adds a distinct count),
    then the 1-row result unpivots to ``(rule, violations, passed)``.
    """
    if not rules:
        raise ValueError("validate_table: rules must be non-empty")
    import re as _re

    aggs = []
    names = []
    for r in rules:
        name, kind = r["name"], r["type"]
        # names are interpolated into the stack() SQL below — restrict to
        # identifier characters so quoting can't break (or inject into)
        # the generated expression
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name or ""):
            raise ValueError(
                f"validate_table: rule name {name!r} must match "
                "[A-Za-z_][A-Za-z0-9_]*"
            )
        names.append(name)
        if kind == "not_null":
            cond = F.col(r["column"]).isNull()
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(name))
        elif kind == "unique":
            c = r["column"]
            aggs.append(
                (
                    F.count(F.col(c)) - F.count_distinct(F.col(c))
                ).alias(name)
            )
        elif kind == "in_set":
            cond = (
                F.col(r["column"]).isNotNull()
                & ~F.col(r["column"]).isin(*r["values"])
            )
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(name))
        elif kind == "range":
            c = F.col(r["column"])
            cond = F.lit(False)
            if r.get("min") is not None:
                cond = cond | (c < r["min"])
            if r.get("max") is not None:
                cond = cond | (c > r["max"])
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(name))
        elif kind == "expression":
            ok = F.expr(r["expr"])
            aggs.append(
                F.sum(F.when(ok, 0).otherwise(1)).alias(name)
            )
        else:
            raise ValueError(f"validate_table: unknown rule type {kind!r}")
    if len(set(names)) != len(names):
        raise ValueError("validate_table: duplicate rule names")
    one = df.agg(*aggs)
    stacked = one.select(
        F.expr(
            "stack({n}, {args}) as (rule, violations)".format(
                n=len(names),
                args=", ".join(f"'{n}', `{n}`" for n in names),
            )
        )
    )
    return stacked.select(
        "rule",
        F.col("violations").cast("bigint").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


def winsorize(
    df: DataFrame,
    col: str,
    group_col: str = None,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str = None,
    exact: bool = True,
) -> DataFrame:
    """Winsorize a numeric column: clip values to the [lower, upper]
    quantiles (optionally per group) — the standard robust-statistics
    step before feeding heavy-tailed features to training.

    ``exact=True`` computes true interpolated percentiles (one
    aggregation whose state holds the group's values — fine to ~10^8
    rows per group); ``exact=False`` uses ``percentile_approx`` (bounded
    sketch state, the 100 TB path). Grouped bounds are a
    group-cardinality-sized broadcast join; ungrouped bounds are one
    scalar row. Appends ``out_col`` (default ``<col>_winsorized``).
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError("winsorize: need 0 <= lower < upper <= 1")
    out_col = out_col or f"{col}_winsorized"
    if exact:
        pct = F.expr(f"percentile({col}, array({lower}, {upper}))")
    else:
        pct = F.percentile_approx(col, [lower, upper], 10_000)
    bounds_cols = [
        F.round(pct[0], config.SIMILARITY_SCALE).alias("__lo"),
        F.round(pct[1], config.SIMILARITY_SCALE).alias("__hi"),
    ]
    clipped = F.round(
        F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi")),
        config.SIMILARITY_SCALE,
    )
    if group_col is None:
        bounds = df.agg(*bounds_cols)
        return (
            df.crossJoin(F.broadcast(bounds))
            .withColumn(out_col, clipped)
            .drop("__lo", "__hi")
        )
    # eqNullSafe: groupBy forms a bounds row for the NULL group, but a plain
    # equality join would never match it and an "append a column" operator
    # would silently DROP every null-group row — null groups must clip
    # against their own bounds like any other group
    bounds = df.groupBy(group_col).agg(*bounds_cols).withColumnRenamed(
        group_col, "__g"
    )
    return (
        df.join(
            F.broadcast(bounds), F.col(group_col).eqNullSafe(F.col("__g"))
        )
        .withColumn(out_col, clipped)
        .drop("__g", "__lo", "__hi")
    )


def type1_boundaries(df: DataFrame, col: str, n_parts: int) -> DataFrame:
    """1-row DataFrame with an array of the ``n_parts - 1`` type-1
    empirical quantile cut points of ``col``: the ACTUAL data value at
    integer rank ``ceil(k * n / n_parts)`` read off a distinct-value
    cumulative-frequency table.

    Pure integer rank arithmetic + exact data values — no float
    interpolation — so the boundaries are bit-identical across engines,
    partitionings, and row orders (interpolated percentiles drift an ulp
    around repeated values). Cost: one distinct-count aggregation plus a
    window over the distinct-values table; at cluster scale substitute
    the two-phase bucketed split the distribution matcher uses
    (schema_matching.py) for the single-partition ordering window.

    Shared by z-order quantile bucketing (operators/layout.py) and
    equal-frequency discretization below.
    """
    from pyspark.sql import Window

    if n_parts < 2:
        raise ValueError("type1_boundaries: n_parts must be >= 2")
    nb = n_parts - 1
    dd = (
        df.select(F.col(col).cast("double").alias("__v"))
        .where(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count("*").alias("__c"))
    )
    wcum = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = dd.select(
        "__v",
        F.sum("__c").over(wcum).alias("__cum"),
        F.sum("__c").over(wtot).alias("__n"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cum") >= F.expr(f"({k} * __n + {nb}) div {n_parts}"),
                F.col("__v"),
            )
        ).alias(f"__q{k}")
        for k in range(1, nb + 1)
    ]
    return cum.agg(*aggs).select(
        F.array(*[F.col(f"__q{k}") for k in range(1, nb + 1)]).alias(
            "__boundaries"
        )
    )


def discretize(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    method: str = "width",
    out_col: str = None,
) -> DataFrame:
    """Bin a numeric column into ``n_bins`` integer bins — the
    feature-binning step before bucketed models, histograms, or
    curriculum tiers.

    ``method='width'``: equal-width bins off one min-max aggregation —
    ``floor((v - min) / (max - min) * n_bins)`` capped into
    [0, n_bins-1]. ``method='frequency'``: equal-mass bins using the
    type-1 empirical quantile boundaries (:func:`type1_boundaries` —
    bit-deterministic cross-engine), bin = #boundaries <= v. NULLs get
    bin NULL. Appends ``out_col`` (default ``<col>_bin``) as int.
    """
    if method not in ("width", "frequency"):
        raise ValueError(f"discretize: unknown method {method!r}")
    if n_bins < 2:
        raise ValueError("discretize: n_bins must be >= 2")
    out_col = out_col or f"{col}_bin"
    v = F.col(col).cast("double")
    if method == "width":
        stats = df.agg(
            F.min(v).alias("__lo"), F.max(v).alias("__hi")
        )
        frac = F.when(
            F.col("__hi") > F.col("__lo"),
            (v - F.col("__lo")) / (F.col("__hi") - F.col("__lo")),
        ).otherwise(F.lit(0.0))
        bin_expr = F.least(
            F.floor(frac * n_bins).cast("int"), F.lit(n_bins - 1)
        )
        return (
            df.crossJoin(F.broadcast(stats))
            .withColumn(
                out_col, F.when(v.isNotNull(), bin_expr).cast("int")
            )
            .drop("__lo", "__hi")
        )
    bnd = type1_boundaries(df, col, n_bins)
    bin_expr = F.aggregate(
        F.col("__boundaries"),
        F.lit(0),
        lambda acc, b: acc + F.when(v >= b, F.lit(1)).otherwise(F.lit(0)),
    ).cast("int")
    return (
        df.crossJoin(F.broadcast(bnd))
        .withColumn(out_col, F.when(v.isNotNull(), bin_expr).cast("int"))
        .drop("__boundaries")
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Corpus datasheet in one pass: the long-form (metric, value) table
    a dataset card needs — size, token mass, quality, exact-duplicate
    rate, and (when ``lang_col`` is given) language concentration.

    Plan shape: the per-document quality/token expressions
    (operators/text.quality_features — pure codegen) feed ONE global
    aggregation; the optional language-concentration metrics add one
    tiny groupBy (|languages| rows) cross-joined in. ``exact_distinct``
    mirrors profile_table: exact count-distinct of the text md5 by
    default, ``False`` switches to approx_count_distinct (HLL) for the
    100 TB path (documented off-oracle like every approx knob).

    Outputs are floor-quantized to 6 decimals (cross-engine float-sum
    determinism). Metrics: n_docs, n_chars, n_tokens_ws,
    avg_tokens_per_doc, avg_quality_score, exact_dup_rate
    [+ n_languages, top_lang_share].
    """
    from .text import quality_features

    q = quality_features(df.select(F.col(text_col).alias("text")))
    distinct_fn = (
        F.count_distinct if exact_distinct else F.approx_count_distinct
    )
    agg = q.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum(F.length("text")).cast("double").alias("n_chars"),
        F.sum("n_tokens").cast("double").alias("n_tokens_ws"),
        F.avg("n_tokens").alias("avg_tokens_per_doc"),
        F.avg("quality_score").alias("avg_quality_score"),
        distinct_fn(F.md5("text")).cast("double").alias("__n_distinct"),
    ).withColumn(
        # clamped at 0: the HLL path's overestimate of distincts would
        # otherwise report a (nonsensical) negative duplicate rate
        "exact_dup_rate",
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - F.col("__n_distinct") / F.col("n_docs"),
        ),
    )
    metrics = [
        "n_docs", "n_chars", "n_tokens_ws", "avg_tokens_per_doc",
        "avg_quality_score", "exact_dup_rate",
    ]
    if lang_col is not None:
        lang = (
            df.groupBy(lang_col).count()
            .agg(
                F.count("*").cast("double").alias("n_languages"),
                (
                    F.max("count").cast("double")
                    / F.sum("count").cast("double")
                ).alias("top_lang_share"),
            )
        )
        agg = agg.crossJoin(F.broadcast(lang))
        metrics += ["n_languages", "top_lang_share"]
    quant = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("metric"),
                        quant(F.col(m)).alias("value"),
                    )
                    for m in metrics
                ]
            )
        ).alias("r")
    ).select("r.metric", "r.value")


def robust_zscore(
    df: DataFrame,
    col: str,
    group_col: str = None,
    out_col: str = None,
    exact: bool = True,
) -> DataFrame:
    """Append the MAD-based robust z-score of a numeric column:
    ``0.6745 * (v - median) / MAD`` where MAD is the median absolute
    deviation (median of |v - median|) and 0.6745 the standard normal
    consistency constant — the outlier score that, unlike the classic
    (v - mean)/stddev, is not itself dragged by the outliers it is
    meant to find (mean and stddev have a breakdown point of 0; median
    and MAD of 50%).

    Two aggregation passes over the column (median, then MAD of the
    residuals) — MAD is not decomposable into one pass. ``exact=True``
    uses true interpolated percentiles; ``exact=False`` swaps in
    ``percentile_approx`` (bounded sketch state, the 100 TB path —
    documented off-oracle like winsorize's). Grouped medians broadcast
    like winsorize's bounds; null-group rows score against their own
    group's statistics (eqNullSafe). A zero MAD (>50% of a group tied
    at the median) yields NULL scores — no meaningful deviation unit
    exists there; callers treat those groups as degenerate.

    Appends ``out_col`` (default ``<col>_rz``) rounded to
    config.SIMILARITY_SCALE.
    """
    out_col = out_col or f"{col}_rz"

    def med(expr_str: str):
        if exact:
            return F.expr(f"percentile({expr_str}, 0.5)")
        return F.expr(f"percentile_approx({expr_str}, 0.5, 10000)")

    v = F.col(col).cast("double")
    score = F.when(
        F.col("__mad") > 0,
        F.round(
            F.lit(0.6745) * (v - F.col("__med")) / F.col("__mad"),
            config.SIMILARITY_SCALE,
        ),
    )
    if group_col is None:
        med1 = df.agg(med(col).alias("__med"))
        stats = (
            df.crossJoin(F.broadcast(med1))
            .agg(
                F.first("__med").alias("__med"),
                med(f"abs(cast({col} as double) - __med)").alias("__mad"),
            )
        )
        return (
            df.crossJoin(F.broadcast(stats))
            .withColumn(out_col, score)
            .drop("__med", "__mad")
        )
    med1 = df.groupBy(group_col).agg(med(col).alias("__med")).withColumnRenamed(
        group_col, "__g1"
    )
    stats = (
        df.join(F.broadcast(med1), F.col(group_col).eqNullSafe(F.col("__g1")))
        .groupBy("__g1")
        .agg(
            F.first("__med").alias("__med"),
            med(f"abs(cast({col} as double) - __med)").alias("__mad"),
        )
    )
    return (
        df.join(F.broadcast(stats), F.col(group_col).eqNullSafe(F.col("__g1")))
        .withColumn(out_col, score)
        .drop("__g1", "__med", "__mad")
    )


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a baseline window and a
    current window of the same feature — the standard drift score for
    monitoring a feature/served-model input over time (PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 action).

    Bins are equal-mass on the BASELINE (type-1 empirical quantiles via
    :func:`type1_boundaries` — bit-deterministic cross-engine; bin =
    #boundaries <= v, the :func:`discretize` convention), so the
    baseline lands ~uniform and any current-side skew is drift. Shares
    are Laplace-smoothed ``(c + 0.5) / (N + 0.5 * n_bins)`` so empty
    bins stay finite; each bin's term ``(p_b - p_c) * ln(p_b / p_c)``
    is floor-quantized to 6 decimals before the total sums them
    (order-free bigint micro-units under the hood).

    Returns one row per occupied bin: ``(bin, n_baseline, n_current,
    psi_term, psi_total)`` with the total repeated via an empty-frame
    window sum (one result, no second query).

    Scale shape: boundaries are one distinct-agg + one window on the
    distinct-value table; binning is an expression against a broadcast
    1-row array; the per-side counts are ONE map-side-combinable groupBy
    each. Nothing is corpus²; at 100 TB swap the boundary window for the
    distribution matcher's two-phase bucketed split (same contract).
    """
    from pyspark.sql import Window

    if n_bins < 2:
        raise ValueError("psi_drift: n_bins must be >= 2")
    bnd = type1_boundaries(baseline, col, n_bins)

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        v = F.col(col).cast("double")
        bin_expr = F.aggregate(
            F.col("__boundaries"),
            F.lit(0),
            lambda acc, b: acc + F.when(v >= b, F.lit(1)).otherwise(F.lit(0)),
        ).cast("int")
        return (
            df.where(v.isNotNull())
            .crossJoin(F.broadcast(bnd))
            .select(bin_expr.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    b = side_counts(baseline, "n_baseline")
    c = side_counts(current, "n_current")
    joined = (
        b.join(c, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_baseline", F.lit(0)).cast("bigint").alias("n_baseline"),
            F.coalesce("n_current", F.lit(0)).cast("bigint").alias("n_current"),
        )
    )
    tot = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    smooth = F.lit(0.5 * n_bins)
    pb = (F.col("n_baseline") + F.lit(0.5)) / (
        F.sum("n_baseline").over(tot) + smooth
    )
    pc = (F.col("n_current") + F.lit(0.5)) / (
        F.sum("n_current").over(tot) + smooth
    )
    term_micro = F.floor((pb - pc) * F.log(pb / pc) * F.lit(1e6) + F.lit(0.5)).cast(
        "bigint"
    )
    return (
        joined.withColumn("__tm", term_micro)
        .select(
            "bin",
            "n_baseline",
            "n_current",
            (F.col("__tm").cast("double") / F.lit(1e6)).alias("psi_term"),
            (F.sum("__tm").over(tot).cast("double") / F.lit(1e6)).alias(
                "psi_total"
            ),
        )
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str = None,
) -> DataFrame:
    """Privacy audit for release/training-data prep: group rows into
    equivalence classes over the quasi-identifier columns and report
    each class's size against the k-anonymity bar — plus, when
    ``sensitive_col`` is given, the class's distinct sensitive-value
    count (l-diversity).

    Returns one row per equivalence class: the quasi columns,
    ``class_size``, ``meets_k`` (class_size >= k), and (if requested)
    ``l_diversity``. Classes with ``meets_k = false`` are the rows a
    release must suppress or generalize.

    ONE map-side-combinable groupBy over the quasi key; the distinct
    sensitive count is exact (``countDistinct``) — swap for
    approx_count_distinct at extreme class counts.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity: need at least one quasi-identifier")
    if k < 1:
        raise ValueError("k_anonymity: k must be >= 1")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).cast("bigint").alias("l_diversity")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs)
    return out.withColumn("meets_k", F.col("class_size") >= F.lit(k))


def suppress_below_k(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Rows whose quasi-identifier equivalence class has >= k members —
    the k-anonymous subset that is safe to release as-is. One window
    count keyed by the quasi identifier (single shuffle; no join back)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    return (
        df.withColumn("__cs", F.count(F.lit(1)).over(w))
        .where(F.col("__cs") >= F.lit(k))
        .drop("__cs")
    )


def impute_missing(
    df: DataFrame,
    cols: list[str],
    strategy: str = "mean",
    group_col: str = None,
    fill_value=None,
) -> DataFrame:
    """Fill NULLs in ``cols`` — the feature-prep step between profiling
    (which found the nulls) and training. Strategies:

    - ``mean``: per-group (or global) average.
    - ``median``: per-group type-1 median — the ACTUAL data value at
      integer rank ``ceil(n/2)`` (same bit-deterministic convention as
      :func:`type1_boundaries`; interpolated medians drift cross-engine).
    - ``mode``: most frequent value, ties to the smallest.
    - ``constant``: ``fill_value`` verbatim.

    Adds ``<col>_was_null`` boolean flags (models often want
    missingness as signal) and fills in place. One aggregation per
    column (map-side combinable, group-keyed) broadcast back — no
    shuffle of the fact table.
    """
    from pyspark.sql import Window

    if strategy not in ("mean", "median", "mode", "constant"):
        raise ValueError(f"impute_missing: unknown strategy {strategy!r}")
    if not cols:
        raise ValueError("impute_missing: need at least one column")
    if strategy == "constant" and fill_value is None:
        raise ValueError("impute_missing: constant strategy needs fill_value")
    out = df
    for c in cols:
        out = out.withColumn(f"{c}_was_null", F.col(c).isNull())
    if strategy == "constant":
        return out.fillna({c: fill_value for c in cols})
    gkey = (
        [F.lit(0).alias("__g")]
        if group_col is None
        else [F.col(group_col).alias("__g")]
    )
    joink = F.lit(0) if group_col is None else F.col(group_col)
    for c in cols:
        # mean/median are numeric (cast); mode keeps the native type
        vexpr = (
            F.col(c) if strategy == "mode" else F.col(c).cast("double")
        )
        nn = df.where(F.col(c).isNotNull()).select(
            *gkey, vexpr.alias("__v")
        )
        if strategy == "mean":
            fills = nn.groupBy("__g").agg(F.avg("__v").alias("__fill"))
        elif strategy == "median":
            # type-1 median: value at rank ceil(n/2) off the per-group
            # distinct-value cumulative-frequency table
            dd = nn.groupBy("__g", "__v").agg(F.count("*").alias("__c"))
            wcum = (
                Window.partitionBy("__g")
                .orderBy("__v")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            wtot = Window.partitionBy("__g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            cum = dd.select(
                "__g",
                "__v",
                F.sum("__c").over(wcum).alias("__cum"),
                F.sum("__c").over(wtot).alias("__n"),
            )
            fills = cum.groupBy("__g").agg(
                F.min(
                    F.when(
                        # integer rank ceil(n/2) — (n+1) div 2, never the
                        # float (n+1)/2 (rank 2.5 would shift even-n
                        # medians up one value)
                        F.col("__cum") >= F.expr("(__n + 1) div 2"),
                        F.col("__v"),
                    )
                ).alias("__fill")
            )
        else:  # mode
            dd = nn.groupBy("__g", "__v").agg(F.count("*").alias("__c"))
            wmode = Window.partitionBy("__g").orderBy(
                F.desc("__c"), F.asc("__v")
            )
            fills = (
                dd.withColumn("__rk", F.row_number().over(wmode))
                .where(F.col("__rk") == 1)
                .select("__g", F.col("__v").alias("__fill"))
            )
        out = (
            out.join(
                F.broadcast(fills), joink.eqNullSafe(F.col("__g")), "left"
            )
            .withColumn(
                c,
                F.when(
                    F.col(c).isNull(), F.col("__fill").cast(df.schema[c].dataType)
                ).otherwise(F.col(c)),
            )
            .drop("__g", "__fill")
        )
    return out


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
    leave_one_out: bool = False,
    out_col: str = None,
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical column — the
    standard high-cardinality categorical feature for tree/linear
    models: ``enc(cat) = (sum_y(cat) + prior * m) / (n(cat) + m)`` with
    ``m = smoothing`` and ``prior`` the global target mean.

    ``leave_one_out=True`` excludes the CURRENT row's target from its
    own encoding (``(sum - y) / (n - 1)`` before smoothing) — the
    train-time variant that blocks target leakage; categories with a
    single row fall back to the prior. NULL categories encode from
    their own NULL group (eqNullSafe join).

    Determinism: sums are computed in exact integer micro-units
    (``floor(y * 1e6 + 0.5)`` per row, bigint aggregation — order-free),
    the division happens once per output row, and the result is
    floor-quantized to 6 decimals — bit-identical cross-engine.

    Scale shape: one global agg + one map-side-combinable groupBy over
    the category key, broadcast back — the fact table never shuffles.
    """
    if smoothing < 0:
        raise ValueError("target_encode: smoothing must be >= 0")
    out_col = out_col or f"{cat_col}_te"
    y_micro = F.floor(
        F.col(target_col).cast("double") * F.lit(1e6) + F.lit(0.5)
    ).cast("bigint")
    staged = df.withColumn("__ym", y_micro)
    gstats = staged.where(F.col("__ym").isNotNull()).agg(
        F.sum("__ym").cast("bigint").alias("__gs"),
        F.count(F.lit(1)).cast("bigint").alias("__gn"),
    )
    cstats = (
        staged.where(F.col("__ym").isNotNull())
        .groupBy(F.col(cat_col).alias("__cat"))
        .agg(
            F.sum("__ym").cast("bigint").alias("__cs"),
            F.count(F.lit(1)).cast("bigint").alias("__cn"),
        )
    )
    prior = F.col("__gs").cast("double") / F.col("__gn") / F.lit(1e6)
    m = F.lit(float(smoothing))
    if leave_one_out:
        s = (F.col("__cs") - F.col("__ym")).cast("double") / F.lit(1e6)
        n = (F.col("__cn") - F.lit(1)).cast("double")
        enc = F.when(
            F.col("__ym").isNotNull() & (F.col("__cn") > 1),
            (s + prior * m) / (n + m),
        ).otherwise(prior)
    else:
        enc = F.when(
            F.col("__cn").isNotNull(),
            (F.col("__cs").cast("double") / F.lit(1e6) + prior * m)
            / (F.col("__cn") + m),
        ).otherwise(prior)
    quant = F.floor(enc * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        staged.crossJoin(F.broadcast(gstats))
        .join(
            F.broadcast(cstats),
            F.col(cat_col).eqNullSafe(F.col("__cat")),
            "left",
        )
        .withColumn(out_col, quant)
        .drop("__ym", "__gs", "__gn", "__cat", "__cs", "__cn")
    )


def categorical_association(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Association between two categorical columns: the contingency
    table with each cell's pointwise-mutual-information contribution,
    plus the table-level mutual information and chi-square statistic
    (repeated per row via empty-frame windows — the engine's
    one-query-full-answer idiom). The feature-selection / redundancy
    screen before encoding categoricals.

    ``mi_term = p_ab * ln(p_ab / (p_a * p_b))``; ``chi2_term =
    (o - e)^2 / e`` with ``e = n_a * n_b / n``. Terms are
    floor-quantized to 6 decimals before the order-free totals
    (bigint micro-units), so results are bit-deterministic.

    Scale shape: three map-side-combinable counts (cells, marginals)
    joined cell-table-sized; output |A| x |B| rows max. NULL categories
    are their own level.
    """
    from pyspark.sql import Window

    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    ma = df.groupBy(F.col(col_a).alias("a")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    mb = df.groupBy(F.col(col_b).alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b")
    )
    tot = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # the FULL |A| x |B| grid, not just observed cells — chi-square's
    # zero-observation cells still contribute (0 - e)^2 / e = e
    grid = F.broadcast(ma).crossJoin(F.broadcast(mb))
    joined = (
        grid.join(
            cells,
            grid["a"].eqNullSafe(cells["a"]) & grid["b"].eqNullSafe(cells["b"]),
            "left",
        )
        .drop(cells["a"])
        .drop(cells["b"])
        .withColumn("n_ab", F.coalesce("n_ab", F.lit(0)).cast("bigint"))
    )
    # total rows n = sum of n_ab over the grid (each observation once)
    joined = joined.withColumn("__n", F.sum("n_ab").over(tot))
    p_ab = F.col("n_ab").cast("double") / F.col("__n")
    p_a = F.col("n_a").cast("double") / F.col("__n")
    p_b = F.col("n_b").cast("double") / F.col("__n")
    mi_micro = F.when(
        F.col("n_ab") > 0,
        F.floor(
            p_ab * F.log(p_ab / (p_a * p_b)) * F.lit(1e6) + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    e = F.col("n_a").cast("double") * F.col("n_b") / F.col("__n")
    chi_micro = F.floor(
        (F.col("n_ab") - e) * (F.col("n_ab") - e) / e * F.lit(1e6) + F.lit(0.5)
    ).cast("bigint")
    return (
        joined.withColumn("__mi", mi_micro)
        .withColumn("__chi", chi_micro)
        .select(
            "a",
            "b",
            "n_ab",
            (F.col("__mi").cast("double") / F.lit(1e6)).alias("mi_term"),
            (F.sum("__mi").over(tot).cast("double") / F.lit(1e6)).alias(
                "mutual_information"
            ),
            (F.sum("__chi").over(tot).cast("double") / F.lit(1e6)).alias(
                "chi_square"
            ),
        )
    )


def ks_statistic(
    a: DataFrame,
    b: DataFrame,
    col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic: ``D = max |F_a(x) -
    F_b(x)|`` over the pooled distinct values — the sharpest simple
    two-sample drift test next to :func:`psi_drift` (PSI needs binning;
    KS is binless and catches location shifts PSI's coarse bins blur).

    Returns one row ``(n_a, n_b, ks_d, ks_at_value)`` — the statistic
    and the data value where the gap peaks (smallest such value on
    ties). Exact integer arithmetic: the empirical CDFs are cumulative
    bigint counts over the pooled distinct-value table, compared as
    cross-multiplied integers (``|c_a * n_b - c_b * n_a|``), so no
    float enters until the final division — bit-deterministic.

    Scale shape: two map-side-combinable value counts, one full-outer
    merge on value, one ordered window for the running sums (single
    exchange), one max aggregation. For 100 TB, substitute the
    distribution matcher's two-phase bucketed split for the global
    ordering window (same contract as type1_boundaries).
    """
    from pyspark.sql import Window

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.col(col).cast("double").alias("__v"))
            .where(F.col("__v").isNotNull())
            .groupBy("__v")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    ca = counts(a, "__ca")
    cb = counts(b, "__cb")
    merged = ca.join(cb, "__v", "full_outer").select(
        "__v",
        F.coalesce("__ca", F.lit(0)).cast("bigint").alias("__ca"),
        F.coalesce("__cb", F.lit(0)).cast("bigint").alias("__cb"),
    )
    wcum = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = merged.select(
        "__v",
        F.sum("__ca").over(wcum).alias("__fa"),
        F.sum("__cb").over(wcum).alias("__fb"),
        F.sum("__ca").over(tot).alias("__na"),
        F.sum("__cb").over(tot).alias("__nb"),
    ).select(
        "__v",
        "__na",
        "__nb",
        # cross-multiplied integer gap: |F_a - F_b| * (n_a * n_b)
        F.abs(
            F.col("__fa") * F.col("__nb") - F.col("__fb") * F.col("__na")
        ).alias("__gap"),
    )
    best = cum.orderBy(F.desc("__gap"), F.asc("__v")).limit(1)
    return best.select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        F.round(
            F.col("__gap").cast("double") / (F.col("__na") * F.col("__nb")),
            6,
        ).alias("ks_d"),
        F.col("__v").alias("ks_at_value"),
    )


def quantile_transform(
    df: DataFrame,
    col: str,
    group_col: str = None,
    out_col: str = None,
) -> DataFrame:
    """Rank-based feature normalization: map each value to its empirical
    quantile ``(rank - 1) / (n - 1)`` in [0, 1] (ties share the AVERAGE
    rank, so equal inputs get equal outputs under any partitioning) —
    the distribution-free scaling that makes heavy-tailed features
    comparable before distance-based models.

    One (group-)ordered window (single exchange + sort) computing
    first-rank + tie-count, then a pure expression. Groups of one row
    map to 0.5 (the degenerate midpoint). Output floor-quantized to 6
    decimals.
    """
    from pyspark.sql import Window

    out_col = out_col or f"{col}_q"
    g = [group_col] if group_col else []
    v = F.col(col).cast("double")
    # nulls sort LAST so they never shift the non-null ranks (their q is
    # masked to NULL below); n counts non-null only
    wrank = Window.partitionBy(*g).orderBy(v.asc_nulls_last())
    wtie = Window.partitionBy(*g, v)
    wall = Window.partitionBy(*g)
    # average rank doubled to stay integer: 2*first + tie - 1
    r2 = (
        F.lit(2) * F.min(F.row_number().over(wrank)).over(wtie)
        + F.count(F.lit(1)).over(wtie)
        - F.lit(1)
    ).cast("bigint")
    n = F.count(v).over(wall)
    q = F.when(n > 1, (r2.cast("double") / 2.0 - 1.0) / (n - 1)).otherwise(
        F.lit(0.5)
    )
    return df.withColumn(
        out_col,
        F.when(
            v.isNotNull(),
            F.floor(q * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6),
        ),
    )


def group_linregress(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str = None,
    y_scale: int = 2,
) -> DataFrame:
    """Closed-form simple linear regression per group: slope, intercept,
    and r² of ``y ~ x`` — the trend-detection pass over grouped metrics
    (per-entity value drift, per-type rate trends) without any ML
    library.

    Determinism contract: x must be integer-valued (epoch hours, day
    numbers, sequence indexes — pre-bucket timestamps accordingly) and
    y is quantized to ``y_scale`` decimals; all five sufficient
    statistics (Σx, Σy, Σxy, Σx², Σy²) are then EXACT bigint sums
    (order-free under any partitioning), and the closed-form combine
    runs once per group in double — the same expression both engines
    evaluate on identical integers. Keep ``x`` spans and ``y_scale``
    small enough that per-group Σx² and Σy² stay under 2^63 (the
    docstring math: |x| <= 1e6 and 1e9 rows fit); this is the exact
    path — at larger magnitudes pre-center x per group upstream.

    Returns ``(group?, n, slope, intercept, r2)`` rounded to 6
    decimals; groups with zero x-variance yield NULL slope/r2. ONE
    map-side-combinable aggregation.
    """
    if y_scale < 0 or y_scale > 6:
        raise ValueError("group_linregress: y_scale must be in [0, 6]")
    g = [group_col] if group_col else []
    ys = 10 ** y_scale
    x = F.col(x_col).cast("bigint")
    y = F.floor(F.col(y_col).cast("double") * F.lit(float(ys)) + F.lit(0.5)).cast(
        "bigint"
    )
    rows = df.select(*g, x.alias("__x"), y.alias("__y")).where(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    agg = rows.groupBy(*[F.col(c) for c in g]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").cast("bigint").alias("__sx"),
        F.sum("__y").cast("bigint").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("bigint").alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("bigint").alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).cast("bigint").alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    slope = num / denx / F.lit(float(ys))
    intercept = (sy / F.lit(float(ys)) - slope * sx) / n
    r2 = (num * num) / (denx * deny)
    q6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        *g,
        "n",
        F.when(F.col("__sxx") * F.col("n") != F.col("__sx") * F.col("__sx"), q6(slope)).alias(
            "slope"
        ),
        F.when(
            F.col("__sxx") * F.col("n") != F.col("__sx") * F.col("__sx"),
            q6(intercept),
        ).alias("intercept"),
        F.when(
            (F.col("__sxx") * F.col("n") != F.col("__sx") * F.col("__sx"))
            & (F.col("__syy") * F.col("n") != F.col("__sy") * F.col("__sy")),
            q6(r2),
        ).alias("r2"),
    )
