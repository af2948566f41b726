import shutil

import pytest

from linkgraph.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="linkgraph-tests", cores=3, shuffle_partitions=3)
    yield s
    shutil.rmtree("./.lg_checkpoints", ignore_errors=True)


@pytest.fixture()
def tmp_ckpt(tmp_path):
    return str(tmp_path / "ckpt")
