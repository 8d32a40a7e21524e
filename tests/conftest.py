from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loongcollector_spark.session import get_spark  # noqa: E402
from loongcollector_spark.synth import ensure_sequences  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="loongcollector-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def seq_path() -> str:
    return ensure_sequences(2000)


@pytest.fixture(scope="session")
def seq_df(spark, seq_path):
    return spark.read.parquet(seq_path)
