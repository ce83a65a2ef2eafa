import pytest


@pytest.fixture(scope="session")
def spark():
    from ccr_web_crawler_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
