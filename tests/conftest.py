import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commerce_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # warehouse dir is a static conf — must be set at session build time
    # (bucketed-table tests create catalog tables there)
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark("tests", cpus=4, extra_conf={"spark.sql.warehouse.dir": wh})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
