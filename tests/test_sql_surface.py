"""spark.sql over the registered engine views."""

from __future__ import annotations

from ocr_spark.sql import register_views

SF = "/root/testdata/sf0.001"


def test_sql_over_engine_views(spark):
    names = register_views(spark, SF)
    assert {"pages", "extracted", "nodes", "documents"} <= set(names)

    n_docs = spark.sql("SELECT count(*) AS n FROM documents").collect()[0].n
    assert (
        spark.sql("SELECT count(*) AS n FROM extracted").collect()[0].n == n_docs
    )

    # cross-view SQL: extraction output joined to raw docs, byte-equality
    ok = spark.sql(
        """
        SELECT count(*) AS n
        FROM extracted e JOIN pages p USING (url)
        WHERE e.extracted_text = p.text
        """
    ).collect()[0].n
    assert ok == n_docs

    # node-level SQL analytics
    row = spark.sql(
        """
        SELECT count(*) AS content_nodes
        FROM nodes WHERE tag = 'p' AND NOT negative AND score >= 0.1
        """
    ).collect()[0]
    assert row.content_nodes == n_docs
