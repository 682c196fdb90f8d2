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


def staleness_report(samples: list[tuple[int, int]]) -> dict:
    """Staleness-in-versions distribution (metrics.go:103-214 parity).

    ``samples`` are (latest_write_version, version_observed_by_read) pairs
    collected by readers sampling ``view.version()`` against the version
    their snapshot was taken at; staleness = write - observed (0 =
    read-your-writes). The reference reconstructs the same distribution
    post-mortem from write/query/cache timestamp logs.
    """
    lags = [float(w - o) for w, o in samples]
    return {
        "samples": len(lags),
        "fresh_fraction": (
            sum(1 for x in lags if x == 0) / len(lags) if lags else None
        ),
        "staleness_versions": percentiles(lags),
    }


class FreshnessListener(StreamingQueryListener):
    """Collects per-batch trigger latency and input rows per view name."""

    def __init__(self):
        self.batches: dict[str, list[dict]] = {}

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        # listener callbacks run on the JVM's event bus via py4j; an
        # exception (or a call racing interpreter teardown) must never
        # propagate back into the bus thread
        try:
            p = event.progress
            name = p.name or p.id
            self.batches.setdefault(str(name), []).append(
                {
                    "batchId": p.batchId,
                    "durationMs": (p.durationMs or {}).get("triggerExecution"),
                    "numInputRows": p.numInputRows,
                }
            )
        except Exception:
            pass

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
