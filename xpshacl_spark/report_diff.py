"""Cross-run violation-report diff: regression triage between two runs.

The operational loop a validation engine serves: run N-1's report is
the baseline; run N's report is compared against it, and only the
DELTA matters — ``new`` violations are regressions to investigate,
``resolved`` violations confirm fixes. The reference re-validates and
re-explains from scratch each run (main.py's one-shot flow, with the
violation-KG cache deduplicating explanation WORK, violation_kg.py);
the tabular engine adds the report-level delta as a first-class
relation so a 100 TB pipeline can alert on regressions without anyone
reading full reports.

Identity of a violation is (shape_id, constraint_component, focus key)
— the same tuple the explanation signature hashes (violation_kg.py:
88-102 uses shape+component+path for the signature; the diff keeps the
focus key so each regressed ROW surfaces, not just each signature).

Plan shape: one full-outer equi-join on the identity columns between
two violation relations, presence flags, one-sided filter — identical
cost model to operators.parity (both sides hash-shuffle once on the
identity; violations written partitioned/bucketed by shape make it
cheaper still since only matching shape buckets meet). Violation
relations are small relative to the input (they are the FAILURES), so
this never touches the 100 TB fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ID_COLS = ("shape_id", "constraint_component")


def violation_diff(
    current: DataFrame,
    previous: DataFrame,
    key_cols: Sequence[str],
    id_cols: Sequence[str] = DEFAULT_ID_COLS,
) -> DataFrame:
    """(id_cols..., key_cols..., status) with status ``new`` for
    violations present only in ``current`` and ``resolved`` for those
    present only in ``previous``. Unchanged violations are absent — the
    empty relation IS the no-regression assertion. Duplicate identity
    rows (one focus row violating the same component twice, e.g. two
    array elements) are collapsed: the diff is over the violation SET."""
    ident = [*id_cols, *key_cols]
    # ONE shuffle (r06): tag each side, union, and aggregate presence
    # flags per identity — the map-side-combined hash agg replaces the
    # former two dropDuplicates shuffles + full-outer join (3 exchanges
    # over violation-sized relations) with a single exchange carrying
    # the same identity columns. max(bool) over the union is exactly
    # "appears on that side at least once", so the one-sided filter and
    # statuses are unchanged.
    tagged = current.select(
        *ident, F.lit(True).alias("_pc"), F.lit(False).alias("_pp")
    ).unionByName(
        previous.select(
            *ident, F.lit(False).alias("_pc"), F.lit(True).alias("_pp")
        )
    )
    per_ident = tagged.groupBy(*ident).agg(
        F.max("_pc").alias("_pc"), F.max("_pp").alias("_pp")
    )
    status = F.when(~F.col("_pp"), F.lit("new")).otherwise(F.lit("resolved"))
    return (
        per_ident.where(~F.col("_pc") | ~F.col("_pp"))
        .select(*ident, status.alias("status"))
    )


def diff_counts(diff: DataFrame, id_cols: Sequence[str] = DEFAULT_ID_COLS):
    """Per-(shape, component) regression summary of a
    :func:`violation_diff` relation: n_new / n_resolved — the row an
    alerting rule keys on."""
    return (
        diff.groupBy(*id_cols)
        .agg(
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias(
                "n_new"
            ),
            F.sum(
                F.when(F.col("status") == "resolved", 1).otherwise(0)
            ).alias("n_resolved"),
        )
    )
