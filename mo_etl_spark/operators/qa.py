"""In-flight data-quality observation (SURVEY.md §2 engine addition).

The reference's ETL monitors itself pipeline-level (u, ActiveData-ETL:
mo-logs structured logging + queue depths; every transform counts what
it consumed/produced).  Spark's native analog is ``df.observe``:
named aggregate metrics computed ON THE SAME PASS as the query — zero
extra scans, collected at action time — the right way to get
rows-consumed / nulls-seen / out-of-range counters at 100 TB (a
separate QA query would re-read the input).

``observed_quality`` attaches a standard QA metric set and parks the
``Observation`` handle in ``LAST`` so callers/tests can read the
metrics after the action; the observed DataFrame is returned unchanged
(observe is a no-op projection in the plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

#: most recent observation per name — readable after the next action
LAST: dict[str, Observation] = {}


def observed_quality(
    df: DataFrame,
    name: str,
    checks: dict[str, Column],
) -> DataFrame:
    """Attach named QA metrics to ``df``'s single execution pass.

    checks maps metric name -> aggregate Column (count/sum/min/max...).
    Read ``LAST[name].get`` after an action has run the plan.
    """
    obs = Observation(name)
    LAST[name] = obs
    return df.observe(obs, *[c.alias(n) for n, c in checks.items()])


def standard_event_checks() -> dict[str, Column]:
    """The counters every feed ingest should carry."""
    return {
        "n_rows": F.count(F.lit(1)),
        "n_null_user": F.sum(F.col("user_id").isNull().cast("long")),
        "n_nonpos_value": F.sum((F.col("value") <= 0).cast("long")),
        "min_ts": F.min("ts"),
        "max_ts": F.max("ts"),
    }
