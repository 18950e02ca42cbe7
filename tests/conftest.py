from __future__ import annotations

import pytest

from sneaky_data_matcher_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sneaky_data_matcher_spark-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def synth_corpus(spark):
    """Deterministic labeled corpus (docs, labeled_pairs), cached."""
    from sneaky_data_matcher_spark.sources.synth import generate_corpus

    docs, pairs = generate_corpus(spark, n_docs=600, seed=42)
    docs = docs.localCheckpoint(eager=True)
    pairs = pairs.localCheckpoint(eager=True)
    return docs, pairs


SF_DIR = "/root/testdata/sf0.001"
