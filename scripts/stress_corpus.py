"""Corpus-scale stress of the dedup family on HEAD (round-5 verdict
next#5): re-measures the round-2/3 walls on current code and demonstrates
restart-resume of ``dup_clusters`` at >=1M docs beyond the pytest toy.

Corpus recipe (round-2 lineage): sf0.1 documents (5,000) replicated
``--replicate`` times; copies with rep%8 != 0 are perturbed (a few words
swapped deterministically per rep) so every original anchors a
near-dup cluster of ~replicate members, 1/8 of them exact.

Usage:
    python scripts/stress_corpus.py --replicate 64          # 320k stress
    python scripts/stress_corpus.py --resume-demo           # 1.28M resume
The resume demo launches dup_clusters in a CHILD process, kills it
mid-iteration (SIGKILL, no cleanup), then re-invokes with the same
table_path and asserts the manifest shows a non-zero resume round and
the final labels match an uninterrupted run.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, replicate: int, group_size: int | None = None):
    """sf0.1 docs x replicate. Without ``group_size`` every original
    anchors one replicate-member near-dup cluster (the round-2 recipe —
    quadratic pairs per cluster, right for 64). With ``group_size`` the
    copies split into groups whose texts diverge heavily (every 3rd word
    group-salted → cross-group shingle Jaccard ~0), bounding clusters to
    ``group_size`` members so pair counts stay linear in corpus size —
    the shape that makes a 1.28M-doc closure run tractable AND realistic
    (real crawls have many small clusters, not 256-member ones)."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = docs.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
    )
    if group_size:
        reps = reps.withColumn(
            "grp", (F.col("rep") / group_size).cast("int")
        ).withColumn(
            "text",
            F.expr(
                "concat_ws(' ', transform(split(text, ' '), (w, i) -> "
                "CASE WHEN grp > 0 AND i % 3 = 2 "
                "THEN concat('g', CAST(grp AS STRING)) ELSE w END))"
            ),
        )
    # deterministic perturbation: rep%8 != 0 prepends a rep-specific token
    # and swaps the 7th word, so copies are near- but not exact dups
    words = F.split("text", " ")
    perturbed = F.concat_ws(
        " ",
        F.concat(F.lit("v"), F.col("rep").cast("string")),
        F.concat_ws(" ", F.slice(words, 1, 6)),
        F.concat(F.lit("w"), F.col("rep").cast("string")),
        F.concat_ws(" ", F.expr("slice(split(text, ' '), 8, 1000000)")),
    )
    return (
        reps.select(
            (F.col("doc_id") * replicate + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") % 8 == 0, F.col("text"))
            .otherwise(perturbed)
            .alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )


def timed(name, fn, out):
    t0 = time.monotonic()
    n = fn()
    dt = time.monotonic() - t0
    out[name] = {"wall_s": round(dt, 1), "rows": n}
    print(f"  {name:28s} {dt:7.1f} s   {n:,} rows", flush=True)


def stress(replicate: int):
    from ocr_spark.operators.dedup import (
        dup_clusters,
        exact_dedup,
        lsh_candidate_pairs,
        simhash64,
        simhash_band_pairs,
        verify_pairs,
    )
    from ocr_spark.session import get_spark

    spark = get_spark("stress", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = build_corpus(spark, replicate)
    n = docs.count()
    print(f"corpus: {n:,} docs (sf0.1 x {replicate})", flush=True)
    results: dict = {"n_docs": n}

    timed("exact_dedup", lambda: exact_dedup(docs).count(), results)
    pairs = None

    def _lsh():
        nonlocal pairs
        pairs = lsh_candidate_pairs(docs, n_bands=4, rows_per_band=2)
        return pairs.count()

    timed("lsh_candidate_pairs", _lsh, results)
    timed(
        "verify_pairs>=0.7",
        lambda: verify_pairs(docs, pairs, min_jaccard=0.7).count(),
        results,
    )
    timed("simhash64", lambda: simhash64(docs).count(), results)
    for bands in (8, 16):
        timed(
            f"simhash_band_pairs(b={bands})",
            lambda b=bands: simhash_band_pairs(docs, n_bands=b).count(),
            results,
        )
    tdir = tempfile.mkdtemp(prefix="stress_clusters_")
    try:
        timed(
            "dup_clusters(table)",
            lambda: dup_clusters(
                verify_pairs(docs, pairs, min_jaccard=0.7).select(
                    "doc_id_a", "doc_id_b"
                ),
                materialize="table",
                table_path=tdir,
            ).count(),
            results,
        )
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()


CHILD = r"""
import sys, os, json
sys.path.insert(0, sys.argv[4])
os.environ.setdefault("SPARK_GRAFT_SF_DIR", sys.argv[3])
from ocr_spark.session import get_spark
from ocr_spark.operators.dedup import lsh_candidate_pairs, verify_pairs, dup_clusters
from scripts.stress_corpus import build_corpus
spark = get_spark("resume_demo", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
docs = build_corpus(spark, int(sys.argv[1]), group_size=8)
pairs = verify_pairs(docs, lsh_candidate_pairs(docs), min_jaccard=0.7).select(
    "doc_id_a", "doc_id_b")
labels = dup_clusters(pairs, materialize="table", table_path=sys.argv[2])
print("RESULT " + json.dumps({
    "n_labels": labels.count(),
    "n_clusters": labels.select("cluster_rep").distinct().count(),
}), flush=True)
spark.stop()
"""


def resume_demo(replicate: int, kill_after: float):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tdir = tempfile.mkdtemp(prefix="resume_demo_")

    def launch():
        return subprocess.Popen(
            [
                sys.executable, "-c", CHILD,
                str(replicate), tdir, SF_DIR, repo,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            cwd=repo,
        )

    try:
        print(f"resume demo: sf0.1 x {replicate}, group_size=8")
        t0 = time.monotonic()
        p = launch()
        # event-based kill: wait for the iteration to durably complete at
        # least one labels round, then SIGKILL mid-closure (no cleanup)
        while True:
            done_rounds = [
                d for d in (os.listdir(tdir) if os.path.isdir(tdir) else [])
                if d.startswith("labels_")
                and os.path.exists(os.path.join(tdir, d, "_SUCCESS"))
            ]
            if len(done_rounds) >= 2 or p.poll() is not None:
                break
            time.sleep(2.0)
        time.sleep(kill_after)  # let the NEXT round get partway in
        p.send_signal(signal.SIGKILL)
        p.wait()
        killed_at = time.monotonic() - t0
        manifest_dir = os.path.join(tdir, "manifest")
        resumed_from = None
        if os.path.isdir(manifest_dir):
            import duckdb

            resumed_from = duckdb.sql(
                f"SELECT next_round FROM read_parquet('{manifest_dir}/*.parquet')"
            ).fetchone()[0]
        print(f"killed after {killed_at:.0f}s; manifest next_round={resumed_from}")
        t1 = time.monotonic()
        p = launch()
        out, _ = p.communicate()
        resumed_wall = time.monotonic() - t1
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        print(
            f"resumed run finished in {resumed_wall:.0f}s: {line[7:]}"
            f" (resumed from round {resumed_from})"
        )
        assert p.returncode == 0
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=64)
    ap.add_argument("--resume-demo", action="store_true")
    ap.add_argument("--kill-after", type=float, default=5.0)
    args = ap.parse_args()
    if args.resume_demo:
        resume_demo(max(args.replicate, 256), args.kill_after)
    else:
        stress(args.replicate)
