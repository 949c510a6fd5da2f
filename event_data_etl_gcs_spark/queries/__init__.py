"""Query registry: every operator/query the engine claims (SURVEY.md §2
inventory + Phase 3 general surface + Phase 4 training-data ops) is
registered here with (a) a Spark implementation ``(spark, sf_dir) ->
DataFrame`` and (b) where SQL-expressible, an equivalent DuckDB oracle SQL
string over the same tables. ``__spark_entry__.py`` exposes this registry
to the driver's correctness gate.
"""

from .registry import QuerySpec, all_queries, get_query, query

# Importing the modules populates the registry.
from . import parity  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import semistructured  # noqa: E402,F401
from . import tpch_more  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import gapfill  # noqa: E402,F401
from . import nullsafe  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import strings2  # noqa: E402,F401
from . import tpch3  # noqa: E402,F401
from . import tpch4  # noqa: E402,F401
from . import tpch5  # noqa: E402,F401
from . import quality_audit  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401

__all__ = ["QuerySpec", "all_queries", "get_query", "query"]
