"""Shared pytest fixtures: one session-scoped SparkSession + fixture data."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from reach_banner_spark.session import build_session

    s = build_session(app_name="rbs-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def lexicon_pdf():
    from reach_banner_spark.fixtures import make_lexicon

    return make_lexicon()


@pytest.fixture(scope="session")
def model_path():
    from reach_banner_spark.fixtures import ensure_model

    return ensure_model()


@pytest.fixture(scope="session")
def small_turns(lexicon_pdf):
    """A small deterministic transcript corpus + its planted spans."""
    from reach_banner_spark.fixtures import make_turns

    return make_turns(n_convs=25, skew_conv_turns=40, lexicon=lexicon_pdf)
