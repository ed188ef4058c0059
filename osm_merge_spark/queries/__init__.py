"""Driver-contract query registry.

Each module contributes `QUERIES: dict[name -> (spark_fn, oracle_sql|None)]`
where spark_fn(spark, sf_dir) -> DataFrame and oracle_sql is ANSI SQL DuckDB
runs on the same parquet tables (views pre-registered by the driver).
Column names/types are aligned pairwise; every double passes through round()
in BOTH engines so value-hashes compare exactly.
"""

from __future__ import annotations


def registry():
    from . import (
        etl, etl2, etl3, etl4, geo, geo2, geo3, geo4, geo5, geo6, geo7,
        graph, relational, text, text2, vectors, zlayout,
    )

    out = {}
    for mod in (geo, geo2, geo3, geo4, geo5, geo6, geo7, graph, etl, etl2,
                etl3, etl4, relational, text, text2, vectors, zlayout):
        out.update(mod.QUERIES)
    return out
