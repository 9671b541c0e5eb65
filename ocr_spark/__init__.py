"""ocr_spark — a PySpark-native web-text extraction engine.

A from-scratch re-expression of the data-processing capabilities of the
reference FOTS pipeline (YanYan0716/ocr) on Spark DataFrames:

* HTML boilerplate stripping (Arc90/readability-style text-density scoring
  over a flattened DOM-node table) — the analog of the reference's
  score-map → contour → box path (``/root/reference/DetectUtil.py:127-216``).
* PDF layout reading order (x/y-cut over page-block tables) — the analog of
  the reference's ``(y, x)`` box sort (``/root/reference/DetectUtil.py:201-203``).
* CRNN/CTC-style line recognition as a batched fixed-weight NumPy kernel in
  an Arrow UDF (``/root/reference/Module/RecognitionBackbone.py``,
  ``Module/RecognitionLoss.py:33-38``).

All heavy computation lives in vectorized pandas/Arrow UDFs (no per-row
Python UDFs); all cross-row semantics (grouping, ordering, joins,
partitioning, resume) are DataFrame operations owned by Catalyst/AQE.
"""

__version__ = "0.1.0"
