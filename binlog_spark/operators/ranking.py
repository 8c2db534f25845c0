"""Distributed global ranking — the two-level idiom shared by every
operator that needs a total order without a single-partition window:

1. ``repartitionByRange`` on the order columns — order-aligned,
   quantile-balanced ranges (Spark samples boundaries; rows with equal
   keys never split across ranges);
2. per-range ``row_number`` — parallel;
3. a broadcast prefix sum over the one-row-per-range counts lifts local
   ranks to global ones.

The result is invariant to where the sampled boundaries land. Consumers:
sorted-neighborhood blocking (``dedup.sorted_neighborhood_pairs``),
equi-depth histograms (``queries.window_equidepth_deciles``); the same
shape (with a value cumsum instead of a count) runs inside
``lake_layout.compaction_plan``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: list[str],
                n_ranges: int = 32, out_col: str = "rn") -> DataFrame:
    """``df`` + a dense global 1-based rank under ``ORDER BY
    order_cols`` (which must be a total order — include a unique
    tiebreaker)."""
    ranged = (df.repartitionByRange(n_ranges, *order_cols)
              .withColumn("_seg", F.spark_partition_id()))
    w_in = Window.partitionBy("_seg").orderBy(*order_cols)
    local = ranged.withColumn("_lr", F.row_number().over(w_in))
    seg_tot = local.groupBy("_seg").agg(F.count("*").alias("_n"))
    w_seg = (Window.orderBy("_seg")
             .rowsBetween(Window.unboundedPreceding, -1))
    prefix = seg_tot.select(
        "_seg",
        F.coalesce(F.sum("_n").over(w_seg), F.lit(0)).alias("_prior"))
    return (local.join(F.broadcast(prefix), "_seg")
            .withColumn(out_col, F.col("_prior") + F.col("_lr"))
            .drop("_seg", "_lr", "_prior"))
