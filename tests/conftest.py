from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmid_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # small core count: unit graphs are tiny; scheduling overhead dominates
    s = get_spark("dmid_spark_tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_ckpt_dir(tmp_path):
    return str(tmp_path / "ckpt")
