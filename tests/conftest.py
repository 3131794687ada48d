from __future__ import annotations

import pytest

from cgtcalc_data_transformer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cgtcalc-tests", shuffle_partitions=8)
    yield s
    s.stop()
