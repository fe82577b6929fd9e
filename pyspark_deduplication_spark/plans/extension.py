"""Catalyst optimizer extension bridge (SURVEY §4 optional polish).

``ext/SimilarityJoinRewrite.scala`` (compiled to
``ext/similarity-rewrite.jar`` by ``tools/build_extension.sh`` — the
jar is a BUILD ARTIFACT, gitignored, never committed: auditors read the
Scala source and the test suite compiles it on demand) injects
an optimizer rule that rewrites the reference's faithful UDF-theta
similarity join — ``a.join(b, similarity(a.c, b.c) >= t)``, physically a
Cartesian product (``/root/reference`` ``soulutionOne.py:53-57``) — into
a blocked equi-join on a ``prefix_key``-style key, with the original UDF
threshold still verifying every surviving pair. Same recall contract as
``operators.linkage.blocked_similarity_join``; the API-level rewrite
remains the primary path, this makes the faithful spelling scale too.

The extension must be on the driver classpath BEFORE the JVM starts, so
it can only be enabled at session creation (``similarity_rewrite_confs``
feeds the builder); it cannot be bolted onto a live session.
"""

from __future__ import annotations

import os

EXTENSION_CLASS = "dedupspark.extensions.SimilarityExtensions"

ENABLED_KEY = "spark.dedupspark.similarityRewrite.enabled"
PREFIX_LEN_KEY = "spark.dedupspark.similarityRewrite.prefixLen"
UDF_NAMES_KEY = "spark.dedupspark.similarityRewrite.udfNames"
# "sortedTokens" (default: two smallest sorted tokens, disjoint
# union-of-equi-joins, best recall) or "prefix" (single substring key)
KEY_MODE_KEY = "spark.dedupspark.similarityRewrite.keyMode"


def extension_jar_path() -> str:
    """Absolute path of the compiled extension jar (may not exist if
    ``tools/build_extension.sh`` has not been run)."""
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "ext", "similarity-rewrite.jar",
    )


def extension_available() -> bool:
    return os.path.exists(extension_jar_path())


def similarity_rewrite_confs() -> dict[str, str]:
    """Builder configs that activate the rewrite on a NEW session::

        builder = SparkSession.builder.master(...)
        for k, v in similarity_rewrite_confs().items():
            builder = builder.config(k, v)
    """
    jar = extension_jar_path()
    return {
        "spark.sql.extensions": EXTENSION_CLASS,
        "spark.driver.extraClassPath": jar,
        "spark.jars": jar,
    }
