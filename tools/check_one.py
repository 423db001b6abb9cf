import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod
from pyspark.sql import SparkSession
from tests.oracle import run_oracle, _rows_to_multiset, assert_pandas_view_matches

import argparse
ap = argparse.ArgumentParser(description="Check named queries against the DuckDB oracle")
ap.add_argument("names", nargs="+", help="query names from queries()")
ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
                help="sf dir (default $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01)")
args = ap.parse_args()
names = args.names
SF = args.sf
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
qs, osql = entrymod.queries(), entrymod.oracle_sql()
for name in names:
    sdf = qs[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if name not in osql:
        print(f"{name}: rows-only rows={len(srows)}")
        continue
    orows, ocols = run_oracle(osql[name], SF)
    sset, scs = _rows_to_multiset(srows, scols)
    oset, ocs = _rows_to_multiset(orows, ocols)
    ok = ([c.lower() for c in scs] == [c.lower() for c in ocs]) and sset == oset
    if ok:
        try:
            assert_pandas_view_matches(srows, scols, osql[name], SF, name)
        except AssertionError as e:
            ok = False
            print(f"  pandas-view gate: {e}")
    print(f"{name}: rows={len(sset)}/{len(oset)} cols_s={scs} cols_o={ocs} {'OK' if ok else 'FAIL'}")
    if not ok:
        for a, b in list(zip(sorted(sset), sorted(oset)))[:5]:
            if a != b: print("  s:", a, "\n  o:", b)
