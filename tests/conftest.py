import pytest

from etl_process_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etl_process_spark_tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s
