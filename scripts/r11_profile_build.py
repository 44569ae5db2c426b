"""cProfile the DataFrame BUILD (no Spark action) of the hot ANN pillars.

Evidence for the r11 plan-construction work (VERDICT r10 #5): wall and
py4j send_command count per registry fn build. Usage:
    PYTHONPATH=... python scripts/r11_profile_build.py name [name...]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from server2_vector_search_server_spark.plans import load_registry
    from server2_vector_search_server_spark.session import get_spark

    spark = get_spark("r11_profile_build")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    for name in names:
        fn = reg[name].fn
        fn(spark, SF_DIR)            # warm (fits, collects, caches JVM paths)
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        fn(spark, SF_DIR)
        pr.disable()
        wall = time.perf_counter() - t0
        s = io.StringIO()
        st = pstats.Stats(pr, stream=s)
        total_send = 0
        for (fname, lineno, func), (cc, nc, tt, ct, callers) in \
                st.stats.items():
            if func == "send_command" and "java_gateway" in fname:
                total_send = max(total_send, nc)
        print(f"{name}: build {wall:.3f}s, py4j send_command calls: "
              f"{total_send}")


if __name__ == "__main__":
    main()
