"""Corpus-trained LM scoring + benchmark contamination."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_spark.operators.lm import contamination_check, lm_score

SF = "/root/testdata/sf0.001"


def test_lm_scores_gibberish_below_prose(spark):
    """Documents drawn from the corpus distribution must outscore
    gibberish and wrong-script text under the corpus-trained model."""
    base = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).limit(200)
    probes = spark.createDataFrame(
        [
            (900001, "scan column sort merge join the data stream value"),
            (900002, "qzx jvk wpf bmg qzx vkj pfw gmb xqz kjv fwp"),
            (900003, "零一二三四五六七八九十百千万亿兆京垓秭穰"),
        ],
        "doc_id long, text string",
    )
    docs = base.unionByName(probes)
    out = {r.doc_id: r.logprob for r in lm_score(docs).collect()}
    assert out[900001] > out[900002] > out[900003]
    # corpus docs live in a tight band above the gibberish probe
    corpus_scores = [v for k, v in out.items() if k < 900000]
    assert min(corpus_scores) > out[900002]


def test_lm_short_docs_score_unseen_floor(spark):
    """No-evidence documents (< 3 chars) score the unseen-class FLOOR —
    the WORST score in the table, never 0.0 (which would be the best and
    let empty junk through a keep-above-threshold gate)."""
    docs = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "a longer document with trigrams")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_trigrams, r.logprob) for r in lm_score(docs).collect()}
    assert out[1][0] == 0 and out[2][0] == 0
    assert out[1][1] == out[2][1]  # both at the floor
    assert out[1][1] < out[3][1] < 0  # floor is strictly the worst


def test_contamination_flags_planted_overlap(spark):
    """A doc embedding a 13-word benchmark passage is flagged; disjoint
    docs are not; a 12-word overlap is NOT (below the shingle width)."""
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu",)],
        "text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "prefix words alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu suffix"),
            (2, "totally unrelated content that shares no shingle with the benchmark at all here"),
            (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu"),  # 12 words
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_hits for r in contamination_check(docs, bench).collect()}
    assert out == {1: 1}


def test_lm_cap_salted_topk_exact_and_plan(spark):
    """The model cap must (a) equal the naive global-window top-k exactly
    on a corpus with MANY distinct trigrams forced through a small cap,
    and (b) never sort the unbounded distinct-trigram table in one task:
    the plan's single-partition sort is fed by the salt-partitioned
    local top-k, so the hash-partitioned window exchange appears BEFORE
    the SinglePartition exchange."""
    from pyspark.sql import Window

    from ocr_spark.operators.lm import _trigrams_expr, lm_train_counts
    from ocr_spark.plans.inspect import explain_str

    # 4000 docs of hash junk → tens of thousands of distinct trigrams
    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.concat(F.lit("junk-"), F.col("id").cast("string")), 256)
        .alias("text"),
    )
    cap = 500
    got = lm_train_counts(docs, max_model_size=cap)

    # the naive global spelling as the oracle
    grams = docs.select(F.explode(F.expr(_trigrams_expr())).alias("trigram"))
    counts = grams.groupBy("trigram").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("trigram").asc())
    want = (
        counts.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= cap)
        .select("trigram", "c")
    )
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert len(got_rows) == cap
    assert got_rows == want_rows

    plan = explain_str(got, "simple")
    hash_pos = plan.find("Exchange hashpartitioning(pmod(xxhash64(trigram")
    assert hash_pos != -1, plan  # level 1: salted window exists
    # level 2 must be bounded: either Catalyst's distributed top-k
    # (TakeOrderedAndProject — per-partition partial take, no global
    # funnel at all) or a SinglePartition exchange fed by the salt-
    # filtered survivors (i.e., AFTER the hash exchange)
    single_pos = plan.find("Exchange SinglePartition")
    assert "TakeOrderedAndProject" in plan or (
        single_pos != -1 and hash_pos < single_pos
    ), plan
