"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
same sf, compare row count + column names + order-insensitive value
hash. Usage: python scripts/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from gxdindexer_spark.session import get_spark  # noqa: E402
from gxdindexer_spark.sources.tables import TPCH_TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> tuple[str, list[str], int]:
    cols = sorted(df.columns)
    df = df[cols]
    # stringify with stable float formatting, sort rows
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}".rstrip("0").rstrip(".")
        return str(v)

    rows = sorted(
        "|".join(cell(v) for v in rec) for rec in df.itertuples(index=False)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return h, cols, len(df)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    json_out = os.environ.get("CHECK_ORACLES_JSON")
    spark = get_spark(app_name="oracle-check", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    report: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} spark error: {e}")
            failures.append(name)
            report[name] = {"err": f"spark: {e}"}
            continue
        spark_sec = time.monotonic() - t0
        if name not in oracles:
            print(
                f"rows  {name:28s} rows={len(sdf)} (no oracle; rows-only) "
                f"[{spark_sec:.1f}s]"
            )
            report[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": len(sdf),
                "oracle_rows": None,
                "err": "no_oracle",
            }
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} duckdb error: {e}")
            failures.append(name)
            report[name] = {"err": f"duckdb: {e}"}
            continue
        sh, scols, sn = normalize(sdf)
        oh, ocols, on = normalize(odf)
        ok = (sh == oh) and (scols == ocols) and (sn == on)
        report[name] = {
            "rows_match": sn == on,
            "schema_match": scols == ocols,
            "hash_match": sh == oh,
            "spark_rows": sn,
            "oracle_rows": on,
            "err": None,
        }
        status = "OK  " if ok else "FAIL"
        print(
            f"{status}  {name:28s} rows={sn}/{on} cols_match="
            f"{scols == ocols} hash={'=' if sh == oh else '!'} "
            f"[{spark_sec:.1f}s]"
        )
        if not ok:
            failures.append(name)
            if scols != ocols:
                print(f"      spark cols: {scols}\n      duck  cols: {ocols}")
            else:
                m = sdf[sorted(sdf.columns)].round(6)
                o = odf[sorted(odf.columns)].round(6)
                print("      spark head:", m.head(3).to_dict("records"))
                print("      duck  head:", o.head(3).to_dict("records"))
    print(
        f"\n{len(failures)} failures" + (f": {failures}" if failures else "")
    )
    if json_out:
        import json as _json

        with open(json_out, "w") as fh:
            _json.dump(report, fh, indent=2)
        print(f"wrote {json_out} ({len(report)} entries)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
