"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "extract_wall_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, "docs_per_sec": <rate>,
     "cpus": <n>, "rows": {...per-query rows...}}

Usage: python bench.py [--sf-dir DIR] [--cpus N] [--queries a,b,c]
The scaling-efficiency evidence (north rule) is produced by running this
twice: SPARK_GRAFT_CPUS=8 python bench.py / SPARK_GRAFT_CPUS=32 ... and
comparing docs_per_sec (see BASELINE.md §scaling).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument(
        "--queries",
        default=(
            "extract_html,extract_full,dom_nodes,extract_pdf,ocr_roundtrip,"
            "dedup_exact,dedup_signatures,dedup_lsh,text_signals,text_langid,"
            "sim_topk,rel_pricing_summary,rel_nation_revenue,events_windowed,"
            "events_sessions,union_branches,sim_ivf,media_features,"
            "ocr_noisy,dedup_verified,extract_pdf_rotated,extract_full_noisy,"
            "dedup_embedding,dedup_simhash_pairs,dedup_chunks,text_redact,curate_corpus,curate_sample,text_lm,text_contamination,dedup_clusters"
        ),
    )
    ap.add_argument(
        "--reps",
        type=int,
        default=2,
        help=(
            "minimum timed reps per query (default 2). For reps >= 2 an "
            "ADAPTIVE floor applies: reps continue (up to max(reps, 5)) "
            "until the two fastest agree within 20%% — see the noise "
            "postmortems in BASELINE.md. Pass --reps 1 for an explicit "
            "single-timed-rep run with no adaptation."
        ),
    )
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import __spark_entry__ as entrymod
    from ocr_spark.session import get_spark

    spark = get_spark(
        "bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qmap = entrymod.queries()
    names = [n for n in args.queries.split(",") if n in qmap]

    # warm the JVM + the full Python worker pool (one worker per core) so
    # the flagship number isn't dominated by one-time interpreter startup
    def _noop(batches):
        yield from batches

    spark.range(int(args.cpus) * 64, numPartitions=int(args.cpus)).mapInPandas(
        _noop, schema="id long"
    ).count()
    qmap["extract_html"](spark, args.sf_dir).limit(64).count()

    # one UNTIMED warm-up execution per query, then best-of-N timed: the
    # first invocation of a query pays one-time costs unrelated to its
    # plan (persist builds, codegen compiles, Python worker module
    # imports) that best-of-2 cannot amortize — dedup_lsh measured 7.5 s
    # cold vs 1.4 s steady-state on identical code. Steady-state is what
    # a long-running 100-TB job actually sees.
    # Adaptive reps: a long shared bench session exposes queries to
    # transient interference (GC pauses, noisy-neighbor bursts, page-cache
    # evictions) that a fixed best-of-2 records as a 5-10x phantom
    # regression (round-2/3 postmortems, BASELINE.md). Keep re-running
    # until the two fastest reps agree within 20% — steady state reached —
    # or the rep cap; the recorded best is then an agreed measurement,
    # not a lucky (or unlucky) draw.
    # --reps 1 is an explicit escape hatch: exactly one timed rep, no
    # adaptive floor (the flag then means what it says).
    max_reps = 1 if args.reps == 1 else max(args.reps, 5)
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        qmap[name](spark, args.sf_dir).count()  # warm-up, untimed
        times: list[float] = []
        for _ in range(max_reps):
            t0 = time.monotonic()
            rows[name] = qmap[name](spark, args.sf_dir).count()
            times.append(time.monotonic() - t0)
            if len(times) >= max(args.reps, 2):
                a, b = sorted(times)[:2]
                if b <= a * 1.2:
                    break
        timings[name] = round(min(times), 3)

    n_docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()
    extract_sec = timings.get("extract_html", float("nan"))
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "extract_wall_sec",
        "value": extract_sec,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs_per_sec": round(n_docs / extract_sec, 1) if extract_sec else None,
        "cpus": int(args.cpus),
        "rows": rows,
        "total_sec": round(sum(timings.values()), 3),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
