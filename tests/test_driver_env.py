"""Driver-environment simulation: the correctness driver builds its OWN
plain SparkSession (none of our session.py tuning). The contract must hold
under bare defaults — run a representative query slice + oracle compare in
a subprocess with an untuned session, AND under a non-UTC host timezone
(``TZ=America/New_York``): timestamp-rendering queries pin the session to
UTC themselves, so every rendered hour/mark/session string must still
match the oracle's naive-UTC reading of the parquet micros."""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em
import duckdb, math

SF = "/root/testdata/sf0.001"
NAMES = ["extract_html", "extract_full", "events_sessions", "events_windowed",
         "events_asof", "text_signals", "dedup_signatures", "sim_topk",
         "rel_rollup"]

con = duckdb.connect()
for t in ["documents", "embeddings", "events", "lineitem", "orders", "customer", "nation"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb): return True
        return abs(fa - fb) <= 1e-9
    return a == b

oracles = em.oracle_sql()
bad = []
for name in NAMES:
    s = norm(em.queries()[name](spark, SF).toPandas())
    o = norm(con.sql(oracles[name]).df())
    if len(s) != len(o) or sorted(s.columns) != sorted(o.columns):
        bad.append(name); continue
    for col in s.columns:
        if not all(eq(x, y) for x, y in zip(s[col], o[col])):
            bad.append(f"{name}.{col}"); break
print(json.dumps({"bad": bad}))
spark.stop()
"""


def test_contract_under_plain_session():
    env = dict(os.environ)
    env["TZ"] = "America/New_York"  # non-UTC JVM default — the driver-host case
    out = subprocess.run(
        [sys.executable, "-c", CHILD],
        capture_output=True,
        text=True,
        timeout=900,
        cwd="/root/repo",
        env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"child failed: {out.stderr[-1500:]}"
    assert json.loads(lines[-1])["bad"] == []
