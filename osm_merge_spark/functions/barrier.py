"""Expression-evaluation barrier.

Catalyst's CollapseProject inlines derived-column expressions into every
consumer, and filter pushdown hoists predicates past projections and even
repartitions. For a predicate that references an expensive derived column
many times (e.g. the 6-edge ray-cast parity sum referencing a derived
lon/lat CASE tree ~18×), inlining multiplies the work and can push the
fused expression past the 64KB codegen method limit into interpreted mode
(measured 4× slower on the AOI clip at sf0.1).

eval_once() forces single evaluation with a one-row explode(array(struct))
— the Generate node is a boundary neither CollapseProject nor predicate
pushdown crosses (the filter references generated attributes), and costs
one struct copy per row. Rows and values are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eval_once(df: DataFrame, cols: list[str],
              keep: list[str] | None = None) -> DataFrame:
    """Materialize `cols` (by name) behind a Generate barrier; keeps
    `keep` columns (default: all others) passing through untouched."""
    keep = keep if keep is not None else [c for c in df.columns if c not in cols]
    out = df.select(
        *keep,
        F.explode(F.array(F.struct(*[F.col(c) for c in cols]))).alias("__pt"),
    )
    for c in cols:
        out = out.withColumn(c, F.col(f"__pt.{c}"))
    return out.drop("__pt")
