"""Pure-Python/NumPy kernels — no Spark imports.

These are the vectorized interiors of the Arrow UDFs in
``ocr_spark.operators``. Keeping them Spark-free makes them unit-testable as
plain functions, mirroring the reference's executable ``__main__`` smoke
blocks (e.g. ``/root/reference/DetectUtil.py:228-245``).
"""
