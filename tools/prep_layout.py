"""Build the physical layout families for a fixture dir, one family at
a time (bounds concurrent shuffle-spill disk: the bucketed fact write
and the denormalized spine join each spill tens of GB at sf100 — run
them back-to-back, not concurrently).

Usage: python tools/prep_layout.py <sf_dir> [family ...]
Defaults to all families in dependency-safe order.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ORDER = ["splits", "aggs", "distincts", "projections", "buckets", "spine"]


def main():
    args = list(sys.argv[1:])
    sf_dir = args.pop(0)
    fams = args or ORDER
    import __spark_entry__ as E
    from duckdb_iceberg_spark import get_spark

    spark = get_spark("prep_layout")
    spark.sparkContext.setLogLevel("ERROR")
    done = []
    for fam in fams:
        done.append(fam)
        os.environ["SPARK_GRAFT_LAYOUT_GROUPS"] = ",".join(done)
        t0 = time.time()
        E.prepare_bucketed_fixtures(spark, sf_dir)
        free = shutil.disk_usage("/").free / 1e9
        print(f"{fam}: {time.time()-t0:.1f}s  (disk free {free:.1f} GB)", flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
