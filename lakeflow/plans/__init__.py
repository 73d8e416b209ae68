from lakeflow.plans.registry import QUERIES, QuerySpec, query

# importing the modules populates QUERIES
from lakeflow.plans import relational  # noqa: F401
from lakeflow.plans import scalar_ops  # noqa: F401

try:
    from lakeflow.plans import llm_ops  # noqa: F401
except ImportError:  # pragma: no cover
    pass

__all__ = ["QUERIES", "QuerySpec", "query"]
