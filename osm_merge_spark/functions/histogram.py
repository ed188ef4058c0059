"""Partitioned cumulative sums over integer histograms.

The engine's percentile/threshold queries (clip_percentile's top-p%
cutoff, key_skew's p99 multiplicity) reduce the corpus to an integer
histogram first — O(distinct values) rows, bounded by the value DOMAIN
(e.g. ≤2e6 distinct e6-floored cosines), never by corpus size — then need
a cumulative count over it. A naive `Window.orderBy(key)` with no
partition spec compiles to a single-partition WindowExec: correct at the
histogram's bounded size, but it is the one plan shape Spark itself warns
about (`WindowExec: No Partition Defined`), and the bound lived only in a
comment.

`hist_cumsum` removes the unpartitioned window entirely with the classic
two-level decomposition:

  1. coarse blocks: `block = key >> block_bits` (arithmetic shift =
     floor-division, so negative keys keep their order);
  2. per-block totals, and each block's OFFSET (sum of all totals strictly
     before it in scan order) via a broadcast self-join over the tiny
     block table — O(blocks²) pairs where blocks ≈ domain / 2^block_bits
     (≤ ~500 for an e6 score domain at the default 12 bits), fully
     hash-partitioned, no window at all;
  3. within-block running sum with a window PARTITIONED by block.

cum(key) = block_offset + within_block_running_sum — identical to the
single-partition form row for row, but every stage is partitioned and the
widest window group is one block. At 100 TB nothing changes: the
histogram is still domain-bounded, and this shape stays shuffle-balanced
even if the domain grows past what one task should sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hist_cumsum(hist: DataFrame, key: str, val: str, *,
                descending: bool = False, cum_col: str = "cum",
                block_bits: int = 12) -> DataFrame:
    """hist(key: integral, val: integral) → hist + `cum_col`, the running
    sum of `val` over keys in ascending (or descending) key order,
    inclusive of the current row. Requires distinct keys (a histogram)."""
    h = hist.withColumn("__blk", F.shiftright(F.col(key).cast("long"),
                                              block_bits))
    bt = h.groupBy("__blk").agg(F.sum(val).alias("__btot"))
    a, b = bt.alias("a"), bt.alias("b")
    before = (F.col("b.__blk") > F.col("a.__blk") if descending
              else F.col("b.__blk") < F.col("a.__blk"))
    off = (
        a.join(F.broadcast(b), before, "left")
        .groupBy(F.col("a.__blk").alias("__blk"))
        .agg(F.coalesce(F.sum("b.__btot"), F.lit(0).cast("long"))
             .alias("__off"))
    )
    order = F.col(key).desc() if descending else F.col(key).asc()
    w = (
        Window.partitionBy("__blk").orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        h.join(F.broadcast(off), "__blk")
        .withColumn(cum_col, F.sum(val).over(w) + F.col("__off"))
        .drop("__blk", "__off")
    )
