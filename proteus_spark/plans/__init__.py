"""Plan-level services: materialized-view substitution."""

from proteus_spark.plans.mvsub import MVCatalog

__all__ = ["MVCatalog"]
