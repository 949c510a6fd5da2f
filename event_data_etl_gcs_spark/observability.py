"""Post-execution plan metrics — the engine's runtime observability.

``collect_plan_metrics`` walks the EXECUTED physical plan (through AQE's
AdaptiveSparkPlan / QueryStage wrappers, which hide the real tree from a
naive traversal) and returns per-node SQL metrics: rows produced, files
and bytes scanned, shuffle bytes/records written, spill. This is the
programmatic form of the Spark UI's SQL tab — what a pipeline uses to
alert on "this run scanned 40 TB instead of 2" or "stage X started
spilling" without a human watching a browser.

Summary numbers worth alerting on:
  * ``scan_bytes`` / ``scan_files`` — did partition pruning/pushdown
    actually happen (a 2-column query reading every column/file is a
    plan regression, visible here before it's a cost regression).
  * ``shuffle_bytes`` — the unit of interconnect pain at 100 TB.
  * ``spill_bytes`` — nonzero means executor memory no longer fits the
    partitions; repartition or bump shuffle partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_KEEP = (
    "numOutputRows",
    "numFiles",
    "filesSize",
    "dataSize",
    "shuffleBytesWritten",
    "shuffleRecordsWritten",
    "spillSize",
)


@dataclass
class NodeMetrics:
    depth: int
    node: str
    metrics: dict[str, int] = field(default_factory=dict)


@dataclass
class PlanMetrics:
    nodes: list[NodeMetrics]

    def _total(self, node_filter, key: str) -> int:
        return sum(
            n.metrics.get(key, 0) for n in self.nodes if node_filter(n.node)
        )

    @property
    def scan_files(self) -> int:
        return self._total(lambda s: s.startswith("Scan"), "numFiles")

    @property
    def scan_bytes(self) -> int:
        return self._total(lambda s: s.startswith("Scan"), "filesSize")

    @property
    def scan_rows(self) -> int:
        return self._total(lambda s: s.startswith("Scan"), "numOutputRows")

    @property
    def shuffle_bytes(self) -> int:
        return self._total(lambda s: s == "Exchange", "shuffleBytesWritten")

    @property
    def spill_bytes(self) -> int:
        return self._total(lambda s: True, "spillSize")


def collect_plan_metrics(df: DataFrame) -> PlanMetrics:
    """Metrics of df's EXECUTED plan. Run an action first (count/collect/
    write) — unexecuted accumulators read as zero."""
    out: list[NodeMetrics] = []

    def walk(node, depth: int) -> None:
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan(), depth)
            return
        if name.endswith("QueryStage"):
            walk(node.plan(), depth)
            return
        it = node.metrics().iterator()
        vals: dict[str, int] = {}
        while it.hasNext():
            kv = it.next()
            if kv._1() in _KEEP:
                vals[kv._1()] = kv._2().value()
        out.append(NodeMetrics(depth, name, vals))
        for i in range(node.children().length()):
            walk(node.children().apply(i), depth + 1)

    walk(df._jdf.queryExecution().executedPlan(), 0)
    return PlanMetrics(out)


def run_with_metrics(df: DataFrame) -> tuple[int, PlanMetrics]:
    """Execute df and return (row_count, PlanMetrics).

    Executes via collect() on THIS frame's plan: count() would build a
    different derived plan, leaving this frame's metric accumulators at
    zero. Result rows come to the driver — for huge frames, measure a
    representative aggregate/limit of the pipeline instead of the full
    output."""
    n = len(df.collect())
    return n, collect_plan_metrics(df)
