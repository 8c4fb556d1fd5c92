"""Shared Spark session + tiny deterministic fixtures (SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
import pytest

from logspark.datagen import role_map_pdf, synth_transcripts, tool_catalog_pdf
from logspark.session import get_spark

TINY_N = 2000


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="logspark-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pdf():
    return synth_transcripts(np.arange(TINY_N), TINY_N)


@pytest.fixture(scope="session")
def transcripts(spark, tiny_pdf):
    return spark.createDataFrame(tiny_pdf).cache()


@pytest.fixture(scope="session")
def dims(spark):
    return {
        "tool_catalog": spark.createDataFrame(tool_catalog_pdf()),
        "role_map": spark.createDataFrame(role_map_pdf()),
    }
