import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from symspellpy_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("symspellpy_spark_tests", cores=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def reference_symspell_module():
    """The reference implementation, importable as a behavioral oracle only."""
    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import symspellpy as ref_mod  # noqa: F401

    return ref_mod


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
