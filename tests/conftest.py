from __future__ import annotations

import pytest

from kgtk_spark.session import get_spark

REF_DATA = "/root/reference/kgtk/tests/data"
TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kgtk_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sample_edges(spark):
    from kgtk_spark.schema import read_kgtk_tsv

    return read_kgtk_tsv(spark, f"{REF_DATA}/sample_kgtk_edge_file.tsv").cache()


@pytest.fixture(scope="session")
def sample_nodes(spark):
    from kgtk_spark.schema import read_kgtk_tsv

    return read_kgtk_tsv(spark, f"{REF_DATA}/sample_kgtk_nodes.tsv").cache()
