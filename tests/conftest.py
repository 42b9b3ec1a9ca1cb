from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from feldera_spark.session import get_spark

    s = get_spark(app_name="feldera_spark_tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    # (r12 measured negative result: whole-stage codegen OFF for the
    # test session was tried for VERDICT #5 and made test_compiler
    # SLOWER — 879 s vs 706 s — the suite is JVM-latency-bound, not
    # Janino-bound. Left at the default.)
    yield s
