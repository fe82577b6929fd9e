"""pyspark_deduplication_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic PySpark re-expression of the query and
data-processing capabilities of ``EbrahimAminiSharifi/pyspark-deduplication``
(counterparty record deduplication + fuzzy record linkage), extended with
the operators a large-scale training-data pipeline needs: near-duplicate
detection (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search, text analysis, and streaming deduplication.

Design principles (see SURVEY.md §7):
- DataFrame/SQL first — declare logical plans, let Catalyst/Tungsten pick
  the physical strategy.
- UDFs only where built-ins genuinely cannot express the semantics, and
  then Arrow-vectorized ``pandas_udf`` applied *after* blocking — never
  inside an unblocked join predicate (the reference's defining hazard,
  reference ``soulutionOne.py:56-57``).
- Every operator is a pure ``DataFrame -> DataFrame`` function.
"""

__version__ = "0.1.0"

from pyspark_deduplication_spark.session import get_spark  # noqa: F401
