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
