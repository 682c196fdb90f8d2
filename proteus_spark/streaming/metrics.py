"""Freshness / latency metrics for the view-maintenance plane.

Reference machinery (no published numbers, BASELINE.md): notification
latency percentiles p50/90/95/99 (internal/metrics/metrics.go:78-101) and a
staleness-in-versions distribution (metrics.go:103-214). Spark equivalents:

- per-micro-batch trigger latency from StreamingQueryListener progress
  events -> the same percentile report;
- version staleness = (view.version() at read time) vs (version at write
  time) — surfaced by SumView.version(); with one writer the distribution
  collapses to read-your-writes unless readers sample concurrently.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


def percentiles(xs: list[float]) -> dict[str, float]:
    if not xs:
        return {}
    s = sorted(xs)

    def pct(p: float) -> float:
        i = min(len(s) - 1, int(round(p / 100.0 * (len(s) - 1))))
        return s[i]

    return {"p50": pct(50), "p90": pct(90), "p95": pct(95), "p99": pct(99)}


class FreshnessListener(StreamingQueryListener):
    """Collects per-batch trigger latency and input rows per view name."""

    def __init__(self):
        self.batches: dict[str, list[dict]] = {}

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        name = p.name or p.id
        self.batches.setdefault(str(name), []).append(
            {
                "batchId": p.batchId,
                "durationMs": (p.durationMs or {}).get("triggerExecution"),
                "numInputRows": p.numInputRows,
            }
        )

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    def report(self) -> dict[str, dict]:
        """Latency percentile report, metrics.go:78-101 shape."""
        out = {}
        for name, rows in self.batches.items():
            ds = [r["durationMs"] for r in rows if r["durationMs"] is not None]
            out[name] = {
                "batches": len(rows),
                "rows": sum(r["numInputRows"] or 0 for r in rows),
                "latency_ms": percentiles([float(d) for d in ds]),
            }
        return out
