"""Full-registry oracle gate as a test target.

The external driver samples ~50 of the registry's entries per round;
the other ~120 only ever get checked locally. This target runs EVERY
entry through the same value comparison the driver uses (via
``tools/check_oracle.compare_query``) so whatever the driver draws is
already known green.

It is opt-in (several minutes of wall-clock):

    ADP_FULL_GATE=1 python -m pytest tests/test_full_registry_gate.py -q

Set ``ADP_FULL_GATE_SF`` to override the data dir (default sf0.001;
the driver gates at sf0.01).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

pytestmark = pytest.mark.skipif(
    not os.environ.get("ADP_FULL_GATE"),
    reason="full-registry gate is opt-in: set ADP_FULL_GATE=1",
)

from advisorydatapipeline_spark.registry import ORACLES, QUERIES  # noqa: E402

GATE_SF_DIR = os.environ.get("ADP_FULL_GATE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    from tools.check_oracle import connect_duck

    con = connect_duck(GATE_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registry_entry_matches_oracle(duck, spark, name):
    from tools.check_oracle import compare_query

    problems, n_rows, _spark_sec, _oracle_sec = compare_query(
        spark, duck, name, QUERIES[name], ORACLES.get(name), GATE_SF_DIR
    )
    assert not problems, f"{name} ({n_rows} rows): {problems}"
