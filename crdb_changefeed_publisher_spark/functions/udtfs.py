"""Python UDTF (user-defined table function) surface — Spark 4 API coverage.

UDTFs are row-at-a-time Python: the SLOW path, provided for API
completeness and for genuinely row-generative logic that SQL can't express.
Production n-gram/chunk generation in this engine is relational
(operators/dedup.py::shingle_rows, operators/text.py::chunk_documents);
the equivalence test pins that the UDTF and the relational form agree.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

_NGRAM_SCHEMA = StructType(
    [
        StructField("idx", IntegerType()),
        StructField("gram", StringType()),
    ]
)


@udtf(returnType=_NGRAM_SCHEMA)
class WordNgrams:
    """LATERAL word_ngrams(text, n): one row per word n-gram with its
    starting index. `SELECT g.* FROM docs, LATERAL word_ngrams(text, 3) g`.
    """

    def eval(self, text: str, n: int):
        words = (text or "").strip().split(" ")
        for i in range(max(len(words) - n + 1, 0)):
            yield i, " ".join(words[i : i + n])


def register_udtfs(spark) -> None:
    spark.udtf.register("word_ngrams", WordNgrams)
