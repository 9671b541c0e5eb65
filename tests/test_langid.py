"""Language-ID accuracy on a constructed 5-language corpus.

The driver testdata carries a ``lang`` column but language-neutral text, so
the oracle-parity check proves only that Spark and DuckDB compute the same
heuristic. This suite proves the heuristic actually CLASSIFIES: real
sentences in each supported language must come back correctly.
"""

from __future__ import annotations

import pytest

from ocr_spark.operators.textstats import lang_id

_SENTENCES = [
    # (lang, text) — ordinary prose with natural stopword density
    ("en", "the quick brown fox jumped over a fence and ran off to the hills"),
    ("en", "a summary of the results is given in the appendix of this report"),
    ("de", "der hund und die katze sind ein gutes beispiel und das ist wahr"),
    ("de", "das wetter ist heute schön und der himmel ist blau und klar"),
    ("fr", "le chat et la souris sont dans le jardin et c'est un beau jour"),
    ("fr", "la maison est grande et les fenêtres sont ouvertes sur un parc"),
    ("es", "el perro y el gato que viven en la casa juegan con los niños"),
    ("es", "las flores de la primavera que crecen y crecen con el sol"),
    ("zh", "今天天气很好我们一起去公园散步吧"),
    ("zh", "机器学习模型需要大量的训练数据 some ascii mixed in"),
]


@pytest.mark.parametrize("expected,text", _SENTENCES)
def test_langid_accuracy(spark, expected, text):
    df = spark.createDataFrame(
        [(0, text, expected)], "doc_id long, text string, lang string"
    )
    row = lang_id(df).collect()[0]
    assert row.predicted_lang == expected, (text, row.asDict())


def test_langid_five_way_columns(spark):
    df = spark.createDataFrame(
        [(0, "hello world", "en")], "doc_id long, text string, lang string"
    )
    cols = lang_id(df).columns
    assert cols == [
        "doc_id", "lang", "predicted_lang", "c_en", "c_de", "c_fr", "c_es", "c_zh",
    ]
