"""The reference's 4-stage record pipeline as composable DataFrame
transforms (SURVEY §2.2 P1–P4; reference `unified_code.py:246-293`).

Reference semantics reproduced:

- ``prepare``  adds literal ``prepared=True``            (`unified_code.py:246-255`)
- ``validate`` requires ``prepared`` (raises otherwise) and backfills a
  missing ``id`` column with NULL                        (`unified_code.py:257-269`)
- ``transform`` adds literal ``transformed=True``        (`unified_code.py:271-280`)
- ``finalize`` requires ``prepared`` AND ``transformed`` (raises) and
  adds ``finalized=True``                                (`unified_code.py:282-293`)

Differences by design (SURVEY §7.4): the reference's contract failure
aborts one chunk mid-job (`unified_code.py:469-470`); here the contract
is checked at PLAN time (a missing column is a schema property, known
before any row moves — fail fast, not per-task), and row-level
constraints get an explicit strict/quarantine choice instead of the
accidental abort-this-chunk behavior.

All stages are narrow (no shuffle): whole-stage codegen fuses the four
``withColumn`` literals into the scan pass, so "pipeline overhead" is
zero at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ContractError(ValueError):
    """A pipeline stage's pre-contract failed (reference raises
    ``ValueError`` at `unified_code.py:266,291`)."""


def prepare(df: DataFrame) -> DataFrame:
    """Stage 1 (`unified_code.py:246-255`)."""
    return df.withColumn("prepared", F.lit(True))


def validate(df: DataFrame) -> DataFrame:
    """Stage 2 (`unified_code.py:257-269`): require ``prepared``;
    backfill a missing ``id`` column with typed NULL
    (`unified_code.py:267-268` injects ``None``)."""
    if "prepared" not in df.columns:
        raise ContractError("validate: input was not prepared (missing 'prepared')")
    if "id" not in df.columns:
        df = df.withColumn("id", F.lit(None).cast("long"))
    return df


def transform(df: DataFrame) -> DataFrame:
    """Stage 3 (`unified_code.py:271-280`)."""
    return df.withColumn("transformed", F.lit(True))


def finalize(df: DataFrame) -> DataFrame:
    """Stage 4 (`unified_code.py:282-293`)."""
    missing = [c for c in ("prepared", "transformed") if c not in df.columns]
    if missing:
        raise ContractError(f"finalize: chunk not ready (missing {missing})")
    return df.withColumn("finalized", F.lit(True))


def run_pipeline(df: DataFrame) -> DataFrame:
    """prepare → validate → transform → finalize, one fused pass
    (the worker kernel `unified_code.py:318-331`)."""
    return finalize(transform(validate(prepare(df))))


def check_rows(
    df: DataFrame, constraint: Column, mode: str = "strict"
) -> tuple[DataFrame, DataFrame | None]:
    """Row-level constraint enforcement (SURVEY §7.4 decision).

    ``strict``: any violating row fails the job at execution time
    (`F.assert_true`); returns (checked_df, None).
    ``quarantine``: violations are split to a side output; returns
    (good_df, bad_df). Both are single-pass, no shuffle.
    """
    if mode == "strict":
        # the assert lives in a FILTER predicate: a projected-then-
        # dropped assert column would be pruned away by Catalyst and
        # never evaluated. assert_true returns NULL on success, so the
        # predicate passes every (non-violating) row through.
        checked = df.filter(
            F.assert_true(constraint, F.lit("row constraint violated")).isNull()
        )
        return checked, None
    if mode == "quarantine":
        return df.filter(constraint), df.filter(~F.coalesce(constraint, F.lit(False)))
    raise ValueError(f"unknown mode {mode!r}")


# ---------------------------------------------------------------------------
# Driver-checkable surface: the 4-stage pipeline over a driver table.
# ---------------------------------------------------------------------------

from ..sources.tables import load_table  # noqa: E402
from .registry import query  # noqa: E402


@query(
    "etl_pipeline_stages",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(NULL AS BIGINT) AS id,
           TRUE AS prepared, TRUE AS transformed, TRUE AS finalized
    FROM nation
    """,
)
def etl_pipeline_stages(spark, sf_dir: str) -> DataFrame:
    """prepare→validate→transform→finalize over ``nation``: flag
    injection + typed-NULL id backfill, reference worker-kernel parity
    (`unified_code.py:318-331`)."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return run_pipeline(n)
