import pytest


@pytest.fixture(scope="session")
def spark():
    from mapbox_vector_tile_spark.engine.session import get_spark

    s = get_spark(app_name="mvt-spark-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
