"""Incremental view-maintenance plane (reference plane 2, SURVEY §0/§3.3):
continuously-maintained materialized views fed by snapshot+subscribe
streams, with catch-up gates, subscriptions, and freshness metrics."""
