"""Column-expression building blocks (JVM-side, whole-stage-codegen friendly).

Everything here returns :class:`pyspark.sql.Column` built from
``pyspark.sql.functions`` higher-order functions — no Python UDFs in the hot
path. UDF-backed helpers live in ``operators/`` where Python is genuinely
required (grouped chunk-merge, model inference).
"""

from server2_vector_search_server_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_normalize,
    similarity_score,
    squared_l2,
)
from server2_vector_search_server_spark.functions.filters import (  # noqa: F401
    where_dict_to_column,
)
