"""Spark-facing operators: thin Arrow-UDF shells around ocr_spark.kernels
plus pure-DataFrame relational operators."""
