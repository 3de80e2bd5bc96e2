import pytest

from docetl_spark import FakeBackend, get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("docetl-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def backend():
    return FakeBackend()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def docs(spark):
    """F1-style fixture: small text rows (FIXTURES.md)."""
    rows = [
        {"id": 0, "text": "This product is good and I love it", "category": "review", "to_be_dropped": "x"},
        {"id": 1, "text": "terrible service, I hate it", "category": "ticket", "to_be_dropped": "x"},
        {"id": 2, "text": "neutral statement about the weather", "category": "news", "to_be_dropped": "x"},
        {"id": 3, "text": "great quality, happy customer", "category": "review", "to_be_dropped": "x"},
        {"id": 4, "text": "the bad awful experience", "category": "ticket", "to_be_dropped": "x"},
    ]
    return spark.createDataFrame(rows)
