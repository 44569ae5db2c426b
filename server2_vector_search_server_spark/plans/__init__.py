"""High-level query surface: named queries + DuckDB oracle twins.

``load_registry()`` imports every query-definition module (their decorators
populate ``registry.REGISTRY``) and returns the registry dict.
"""

from __future__ import annotations

import importlib

_QUERY_MODULES = [
    "server2_vector_search_server_spark.plans.vector_queries",
    "server2_vector_search_server_spark.plans.document_queries",
    "server2_vector_search_server_spark.plans.relational_queries",
    "server2_vector_search_server_spark.plans.dedup_queries",
    "server2_vector_search_server_spark.plans.text_queries",
    "server2_vector_search_server_spark.plans.ann_queries",
    "server2_vector_search_server_spark.plans.streaming_queries",
    "server2_vector_search_server_spark.plans.extended_queries",
    "server2_vector_search_server_spark.plans.temporal_queries",
    "server2_vector_search_server_spark.plans.tpch_queries",
    "server2_vector_search_server_spark.plans.sampling_queries",
    "server2_vector_search_server_spark.plans.function_queries",
    "server2_vector_search_server_spark.plans.layout_queries",
    "server2_vector_search_server_spark.plans.breadth_queries",
    "server2_vector_search_server_spark.plans.tpch_queries2",
    "server2_vector_search_server_spark.plans.curation_queries",
    "server2_vector_search_server_spark.plans.breadth_queries2",
    "server2_vector_search_server_spark.plans.retrieval_queries",
    "server2_vector_search_server_spark.plans.graph_queries",
    "server2_vector_search_server_spark.plans.product_analytics_queries",
    "server2_vector_search_server_spark.plans.basket_queries",
    "server2_vector_search_server_spark.plans.breadth_queries3",
    "server2_vector_search_server_spark.plans.sketch_queries",
    "server2_vector_search_server_spark.plans.source_queries",
    "server2_vector_search_server_spark.plans.web_queries",
    "server2_vector_search_server_spark.plans.variant_queries",
    "server2_vector_search_server_spark.plans.linkage_queries",
    "server2_vector_search_server_spark.plans.training_queries",
    "server2_vector_search_server_spark.plans.insight_queries",
    "server2_vector_search_server_spark.plans.spatial_queries",
    "server2_vector_search_server_spark.plans.quality_queries",
]


def load_registry():
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    from server2_vector_search_server_spark.plans.registry import REGISTRY
    return REGISTRY
