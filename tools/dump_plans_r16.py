"""Dump .explain('formatted') for a set of catalog queries to plans/r16/.

Usage: python tools/dump_plans_r16.py before|after query1 query2 ...
Runs at sf0.1 (the bench scale) on a small local session — the plan shape
is independent of core count; AQE initial plans are what explain() shows.
"""
import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from bench import CORE_QUERIES  # noqa: E402  (merged catalog)
from service_alerts_connector_spark.session import get_spark  # noqa: E402

suffix = sys.argv[1]
names = sys.argv[2:]
spark = get_spark(app_name="plan-dump", master="local[8]", shuffle_partitions=8)
sf = "/root/testdata/sf0.1"
import os

os.makedirs("/root/repo/plans/r16", exist_ok=True)
for name in names:
    df = CORE_QUERIES[name](spark, sf)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(f"/root/repo/plans/r16/{name}_{suffix}.txt", "w") as f:
        f.write(buf.getvalue())
    print(name, "ok")
