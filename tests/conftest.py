import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from open_source_search_engine_spark.session import get_spark
    s = get_spark(app="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(autouse=True, scope="module")
def _release_spark_blocks():
    """Backstop against block-manager leaks across the suite: after each
    test module, drop every cached query and persistent RDD (including
    localCheckpoint blocks whose Python handles are gone but whose JVM
    objects py4j hasn't collected yet).  Module scope is safe — module
    fixtures die with the module; nothing cached crosses modules except
    the SparkSession itself."""
    yield
    from pyspark.sql import SparkSession
    s = SparkSession.getActiveSession()
    if s is None:
        return
    try:
        s.catalog.clearCache()
        for _, jrdd in s.sparkContext._jsc.getPersistentRDDs().items():
            jrdd.unpersist(False)
    except Exception:
        pass
