"""Declarative data-validation suite (Deequ-style, Schelter et al.
VLDB'18 "Automating Large-Scale Data Quality Verification"): a list of
constraints over a table compiles into the MINIMUM number of passes —
every row-local constraint becomes one conditional counter inside a
single hash aggregate (one scan, map-side combined, no shuffle of raw
rows); uniqueness constraints add count-distincts to the SAME aggregate
(Catalyst's Expand keeps it one scan); referential-integrity constraints
are each one left-anti broadcast/hash join counted to a single row.

The report is all-integer (n_rows, n_violations, passed) — the repo's
standing ulp-free contract — and is itself a DataFrame, so it can be
persisted next to the dataset as a quality ledger or asserted on in a
pipeline gate.

At 100 TB this is the shape you want: checks share scans instead of
running one job per constraint (the naive Deequ deployment mistake), the
violation counters are associative longs, and nothing but the one-row
report ever reaches the driver.

No reference counterpart (mandated beyond-reference pipeline operator).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "complete",
    "unique",
    "in_range",
    "matches",
    "refers_to",
    "validate",
    "suggest_checks",
]


@dataclass(frozen=True)
class Check:
    """One named constraint.

    kind:
      - 'row':    ``violation_expr`` is a boolean SQL expression counting
                  a violation when TRUE (row-local — folds into the
                  shared single-scan aggregate).
      - 'unique': ``col`` must be unique among its non-null values
                  (count_distinct(col) == count(col); adds a distinct
                  branch to the same aggregate).
      - 'ref':    every non-null ``col`` value must exist in
                  ``ref_df[ref_col]`` (left-anti join, counted).
    """

    name: str
    kind: str
    violation_expr: str | None = None
    col: str | None = None
    ref_df: DataFrame | None = None
    ref_col: str | None = None


def complete(col: str, name: str | None = None) -> Check:
    """No NULLs allowed in ``col``."""
    return Check(name or f"complete({col})", "row", f"{col} is null")


def unique(col: str, name: str | None = None) -> Check:
    """Non-null values of ``col`` are pairwise distinct."""
    return Check(name or f"unique({col})", "unique", col=col)


def in_range(col: str, lo, hi, name: str | None = None) -> Check:
    """Non-null ``col`` within [lo, hi]."""
    return Check(
        name or f"in_range({col})",
        "row",
        f"{col} is not null and ({col} < {lo} or {col} > {hi})",
    )


def matches(col: str, regex: str, name: str | None = None) -> Check:
    """Non-null ``col`` matches ``regex`` (keep it RE2/Java-portable)."""
    return Check(
        name or f"matches({col})",
        "row",
        f"{col} is not null and not regexp_like({col}, '{regex}')",
    )


def refers_to(
    col: str, ref_df: DataFrame, ref_col: str, name: str | None = None
) -> Check:
    """Every non-null ``col`` value exists in ``ref_df[ref_col]``."""
    return Check(
        name or f"refers_to({col})",
        "ref",
        col=col,
        ref_df=ref_df,
        ref_col=ref_col,
    )


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(check, n_rows, n_violations, passed) — one row per constraint.

    All 'row' and 'unique' checks share ONE aggregate over ONE scan;
    each 'ref' check is one anti-join job unioned in.
    """
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).alias("__n")]
    local = [c for c in checks if c.kind in ("row", "unique")]
    refs = [c for c in checks if c.kind == "ref"]
    bad = [c for c in checks if c.kind not in ("row", "unique", "ref")]
    if bad:
        raise ValueError(f"unknown check kinds: {[c.kind for c in bad]}")
    for i, c in enumerate(local):
        if c.kind == "row":
            aggs.append(
                # coalesce: sum over ZERO rows is NULL, but an empty
                # table violates nothing — the report must say (0, true)
                F.coalesce(
                    F.sum(
                        F.when(F.expr(c.violation_expr), F.lit(1)).otherwise(
                            F.lit(0)
                        )
                    ),
                    F.lit(0),
                ).alias(f"__v{i}")
            )
        else:  # unique: violations = non-null count - distinct count
            aggs.append(
                (
                    F.count(F.col(c.col))
                    - F.countDistinct(F.col(c.col))
                ).alias(f"__v{i}")
            )
    parts: list[DataFrame] = []
    if local:
        # ONE aggregate row, exploded into one report row per check —
        # a union of per-check selects would rescan the table per check.
        one = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(c.name).alias("check"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__v{i}").cast("long").alias("n_violations"),
                (F.col(f"__v{i}") == 0).alias("passed"),
            )
            for i, c in enumerate(local)
        ]
        parts.append(
            one.select(F.explode(F.array(*structs)).alias("r")).select(
                "r.*"
            )
        )
    for c in refs:
        keys = c.ref_df.select(F.col(c.ref_col).alias("__k")).distinct()
        orphans = (
            df.filter(F.col(c.col).isNotNull())
            .select(F.col(c.col).alias("__k"))
            .join(keys, "__k", "left_anti")
        )
        parts.append(
            df.agg(F.count(F.lit(1)).alias("n")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("v"))
            ).select(
                F.lit(c.name).alias("check"),
                F.col("n").cast("long").alias("n_rows"),
                F.col("v").cast("long").alias("n_violations"),
                (F.col("v") == 0).alias("passed"),
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "check string, n_rows long, n_violations long, passed boolean"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def suggest_checks(
    profile: DataFrame, matches_regexes: dict[str, str] | None = None
) -> list[Check]:
    """Close the profile -> validate loop (Deequ's constraint-suggestion
    stage): derive a Check list from a ``pipeline/profile.py`` report.

    Rules (each from one profile row, driver-side — the report is
    column-count sized):
      - n_nulls == 0        -> ``complete(col)``
      - ndv == non-null rows (and > 1) -> ``unique(col)``
      - numeric min/max present -> ``in_range(col, min, max)`` (the
        observed envelope; new data outside it is what you want flagged)
      - caller-supplied regex per column -> ``matches(col, regex)``

    The suggestions are ordinary :class:`Check` objects — feed them back
    through :func:`validate` (one scan) on tomorrow's partition and the
    suite asserts today's invariants. Suggestion is heuristic by nature;
    the CONTRACT is only that suggested checks PASS on the profiled data
    itself (tested), mirroring Deequ's suggestion semantics.
    """
    rows = profile.collect()
    out: list[Check] = []
    regexes = matches_regexes or {}
    for r in rows:
        c = r["col_name"]
        if r["n_nulls"] == 0:
            out.append(complete(c))
        nn = r["n_rows"] - r["n_nulls"]
        if r["ndv"] is not None and nn > 1 and r["ndv"] == nn:
            out.append(unique(c))
        if r["min_num"] is not None and r["max_num"] is not None:
            out.append(in_range(c, r["min_num"], r["max_num"]))
        if c in regexes:
            out.append(matches(c, regexes[c]))
    return out
