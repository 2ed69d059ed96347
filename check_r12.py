"""Targeted oracle-parity check for the round-12 optimizer: run the named
declared queries against their DuckDB oracles at sf0.001 AND sf0.01 and
print pass/fail per (query, sf).

Usage: python check_r12.py <query> [<query> ...]
"""

from __future__ import annotations

import sys

import __spark_entry__ as entrymod
from dbt_tpch_spark.parity import check_query
from dbt_tpch_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("dbt-tpch-spark-check-r12", shuffle_partitions=8)
    failed = False
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            res = check_query(spark, sf_dir, queries[name], oracles[name])
            ok = bool(
                res.get("rows_match")
                and res.get("cols_match")
                and res.get("values_match")
            )
            print(f"{sf_dir.rsplit('/',1)[-1]:8s} {name:40s} "
                  f"{'PASS' if ok else 'FAIL ' + str(res)[:400]}", flush=True)
            failed = failed or not ok
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
