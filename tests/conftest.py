import pytest

from datatools_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("datatools-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
