"""SQL surface: register the engine's relations as temp views.

``register_views(spark, sf_dir)`` exposes the full relational surface for
``spark.sql`` use — the engine is DataFrame-first, but every relation is
an ordinary view once registered, so users can mix extraction output with
SQL analytics freely (and Catalyst sees one plan across both).

Views: pages, extracted, nodes, documents, embeddings, plus the driver
testdata star schema (region nation customer supplier part orders
lineitem events) when present.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_STAR = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Registers all views; returns the list of names registered."""
    from ocr_spark.operators.extract_html import extract_pages
    from ocr_spark.operators.nodes import tokenize_to_nodes
    from ocr_spark.sources.pages import pages_from_documents

    registered: list[str] = []
    for t in _STAR:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)
            registered.append(t)
    pages = pages_from_documents(spark, sf_dir)
    pages.createOrReplaceTempView("pages")
    extract_pages(pages).createOrReplaceTempView("extracted")
    tokenize_to_nodes(pages).createOrReplaceTempView("nodes")
    registered += ["pages", "extracted", "nodes"]
    return registered
