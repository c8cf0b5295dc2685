from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# transformWithStateInPandas needs google.protobuf in the Spark-spawned
# Python workers. The container has no protobuf install, but the Cloud SDK
# bundles a pure-Python runtime; vendor/pbshim/sitecustomize.py wires it up
# in every child interpreter. Must happen BEFORE the JVM starts so workers
# inherit the env (see that file's docstring).
_PBSHIM = os.path.join(REPO_ROOT, "vendor", "pbshim")
_SDK_PB = "/usr/lib/google-cloud-sdk/platform/google_appengine"
try:
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(_SDK_PB):
        os.environ["PYTHONPATH"] = os.pathsep.join(
            p for p in (_PBSHIM, os.environ.get("PYTHONPATH")) if p
        )

from crdb_changefeed_publisher_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
