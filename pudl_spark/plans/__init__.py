"""Composed query plans: the driver-facing query registry and the
headline bench queries.
"""

from pudl_spark.plans.queries import QUERIES, ORACLES, run_query

__all__ = ["QUERIES", "ORACLES", "run_query"]
