from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from arcade_spark.session import get_spark

    s = get_spark(app="arcade-tests", cores=4, driver_mem="8g")
    yield s


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    from arcade_spark.corpus import write_corpus

    path = str(tmp_path_factory.mktemp("corpus") / "corpus.parquet")
    write_corpus(path, n_rows=6000, seed=42)
    return path
