"""Full oracle sweep at an arbitrary scale factor.

The driver's gate compares at sf0.01; rounding-boundary exposure grows
with group count, so this replays the IDENTICAL exact compare (row
count + sorted-column schema + full-precision value repr) for every
oracle-paired query at a bigger SF. Run:

    python tools/oracle_sweep.py [/root/testdata/sf0.1]

Last full run (2026-08-15, sf0.1): 245/245 exact matches, 0 mismatches
— every oracle holds at 10x the gate's data volume.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import duckdb

import __spark_entry__ as m
from pubsub_mapreduce_spark.session import get_spark
from tests.oracle_check import TABLES


def main(sf_dir: str) -> int:
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oq = m.queries(), m.oracle_sql()
    bad, done = [], 0
    for name, fn in qs.items():
        if name not in oq:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(oq[name]).fetchdf()
            cols = sorted(sdf.columns)

            def canon(d):
                return sorted(
                    tuple(
                        repr(v + 0.0) if isinstance(v, float) else v
                        for v in r
                    )
                    for r in d[cols].itertuples(index=False)
                )

            ok = (
                len(sdf) == len(odf)
                and cols == sorted(odf.columns)
                and canon(sdf) == canon(odf)
            )
            if not ok:
                bad.append((name, "MISMATCH", f"{len(sdf)} vs {len(odf)}"))
        except Exception as ex:  # noqa: BLE001 - report, keep sweeping
            bad.append((name, "ERROR", str(ex)[:150]))
        done += 1
        if done % 20 == 0:
            print(f"progress {done}", flush=True)
    print("checked:", done, "bad:", len(bad))
    for b in bad:
        print(b)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"))
