import pytest


@pytest.fixture(scope="session")
def spark():
    from sbb_ocr_postcorrection_spark.pipeline import build_session

    s = build_session(app="tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
