"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship wire-format CDC replay (frames → vectorized
Arrow decode → transaction assembly → fold → bucketed MERGE) and returns
the final repo-content state with the sha256 parity column.
``queries``/``oracle_sql`` register every implemented operator per
SURVEY.md §2 plus the training-data pipeline family (dedup, similarity,
text analysis, multimodal plumbing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic binlog replay into the lake table."""
    from binlog_spark.queries import cdc_replay_final_state

    return cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from binlog_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from binlog_spark.queries import ORACLES

    return dict(ORACLES)
