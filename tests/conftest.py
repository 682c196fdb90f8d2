"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proteus_spark.session import build_session  # noqa: E402

SF_SMOKE = os.environ.get("PROTEUS_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("PROTEUS_TEST_SF_CORRECT", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="proteus_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
