"""Query planning: routing between the indexed path and brute force."""

from pim_lucene_spark.plans.router import QueryRoute, route_query, search_with_fallback

__all__ = ["QueryRoute", "route_query", "search_with_fallback"]
