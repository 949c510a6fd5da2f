"""Registry of named queries with optional DuckDB oracles."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    # ANSI SQL for DuckDB over the same tables; None = rows-only check.
    # A CALLABLE oracle takes the sf_dir and returns the SQL — for
    # expected-table oracles whose literals are precomputed from the
    # input parquet by an independent implementation (e.g. direct zlib
    # over document text). Use resolve_oracle() to materialize.
    oracle: str | Callable[[str], str] | None
    doc: str = ""


def resolve_oracle(spec: "QuerySpec", sf_dir: str) -> str | None:
    """Materialize a spec's oracle SQL for a given scale-factor dir."""
    if spec.oracle is None:
        return None
    return spec.oracle(sf_dir) if callable(spec.oracle) else spec.oracle


_REGISTRY: dict[str, QuerySpec] = {}
_PRIORITY: list[str] = []


def query(name: str, oracle: str | Callable[[str], str] | None = None, doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def set_priority(names: list[str]) -> None:
    """Set the inventory's leading order: ``all_queries()`` emits these
    names first (in this order), then everything else in registration
    order. The correctness driver checks a prefix of the inventory, so the
    prefix must span every operator family — SURVEY §2 parity core, the
    LLM-pipeline ops (dedup/ANN/multimodal/text/sampling/corpus), and the
    headline analytics — not just whichever modules imported first."""
    unknown = [n for n in names if n not in _REGISTRY]
    if unknown:
        raise ValueError(f"priority names not registered: {unknown}")
    _PRIORITY.clear()
    _PRIORITY.extend(names)


def all_queries() -> dict[str, QuerySpec]:
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    for n, spec in _REGISTRY.items():
        if n not in ordered:
            ordered[n] = spec
    return ordered


def get_query(name: str) -> QuerySpec:
    return _REGISTRY[name]
