"""Ad-hoc oracle parity check for named queries.

Usage: PYTHONPATH=/root/repo python scripts/check_queries.py [--sf DIR] name...
Runs the full_sweep compare (driver-hash-equivalent) for just the named
queries; prints OK/FAIL per query, exits 1 on any failure.
"""

import sys

args = sys.argv[1:]
sf = "/root/testdata/sf0.01"
if args and args[0] == "--sf":
    sf = args[1]
    args = args[2:]
names = args
sys.argv = [sys.argv[0]]   # full_sweep consumes argv at import

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

sys.path.insert(0, "/root/repo/scripts")
from full_sweep import TABLES, frames_equal  # noqa: E402

from server2_vector_search_server_spark.plans import load_registry  # noqa: E402


def main():
    reg = load_registry()
    unknown = [n for n in names if n not in reg]
    if unknown:
        print("unknown queries:", unknown)
        sys.exit(2)
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    for name in names:
        rq = reg[name]
        try:
            got = rq.fn(spark, sf).toPandas()
            if rq.oracle is None:
                print(f"{name}: rows-only {len(got)}")
                continue
            want = con.execute(rq.oracle).df()
            ok = frames_equal(got, want)
            print(f"{name}: {'OK' if ok else 'FAIL'} rows={len(got)} "
                  f"oracle_rows={len(want)}")
            if not ok:
                bad.append(name)
                if len(got) <= 20 and len(want) <= 20:
                    print("-- got --\n", got.to_string())
                    print("-- want --\n", want.to_string())
        except Exception as ex:
            bad.append(name)
            import traceback
            traceback.print_exc()
            print(f"{name}: ERROR {type(ex).__name__}: {ex}"[:500])
    print("FAILURES:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
