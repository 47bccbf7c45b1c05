"""Local replica of the driver's DuckDB-oracle comparison so mismatches
surface in `pytest` before the driver runs.

Compare contract (mirroring the driver): row count, schema-insensitive
column set, and order-insensitive value comparison with columns sorted by
name. Floats compare exactly (the queries round on both sides by design);
a tiny tolerance is applied only as a diagnostic to distinguish "noise"
from "wrong".
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format at full precision
        return repr(v + 0.0)
    return v


def compare(spark_df, con, sql: str, name: str = "") -> None:
    sdf = spark_df.toPandas()
    odf = con.execute(sql).fetchdf()
    assert len(sdf) == len(odf), (
        f"{name}: row count {len(sdf)} (spark) != {len(odf)} (oracle)"
    )
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    s_rows = sorted(
        tuple(_norm(v) for v in row) for row in sdf[s_cols].itertuples(index=False)
    )
    o_rows = sorted(
        tuple(_norm(v) for v in row) for row in odf[o_cols].itertuples(index=False)
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_rows)} row mismatches; first 3: "
        f"{mismatches[:3]} (cols {s_cols})"
    )
