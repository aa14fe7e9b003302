from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "external: needs a package absent from the hermetic sandbox "
        "(auto-skips via importorskip; runs after `pip install`)",
    )


@pytest.fixture(scope="session")
def spark():
    from gpu_accelerated_vector_indexing_spark.session import get_spark

    spark = get_spark("gpu_accelerated_vector_indexing_spark-tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
