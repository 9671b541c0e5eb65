"""Run-twice determinism across the Python-kernel-heavy query surface
(SURVEY §5): identical results on repeated evaluation — guards against
the reference's RNG-in-geometry trap recurring anywhere, and against
batch-boundary or partition-order sensitivity in the Arrow kernels."""

from __future__ import annotations

import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"

# the queries whose lineage crosses Python kernels (JVM expressions are
# deterministic by construction; these are where nondeterminism could hide)
NAMES = [
    "extract_html",
    "extract_full",
    "extract_full_noisy",
    "extract_pdf",
    "ocr_roundtrip",
    "ocr_noisy",
    "dedup_signatures",
    "sim_ivf",
    "media_features",
    "events_sessions",
]


@pytest.mark.parametrize("name", NAMES)
def test_query_deterministic(spark, name):
    fn = em.queries()[name]
    a = sorted(map(tuple, fn(spark, SF).collect()))
    b = sorted(map(tuple, fn(spark, SF).collect()))
    assert a == b
