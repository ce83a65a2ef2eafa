import pytest


@pytest.fixture(scope="session")
def spark():
    from ccr_web_crawler_spark.session import get_spark

    # task_cpus=1: tests check correctness, not the python-worker core
    # pairing the engine default (task.cpus=2) exists for — keep the
    # tiny test session fully parallel
    spark = get_spark(
        app_name="tests", master="local[8]", shuffle_partitions=8, task_cpus=1
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
