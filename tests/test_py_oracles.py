"""The registered Python reference oracles (plans/py_oracles.py) must
(a) pass against the live engine at sf0.001, and (b) actually DETECT
divergence — an oracle that can't fail is a rubber stamp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.caching import (
    release_cached,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.plans.py_oracles import (
    PY_ORACLES,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

_SPECS = {s.name: s for s in QUERIES if s.name in PY_ORACLES}


@pytest.mark.parametrize("name", sorted(PY_ORACLES))
def test_py_oracle_passes_live(spark, name):
    spec = _SPECS[name]
    assert spec.oracle is None and spec.py_oracle is not None
    pdf = spec.fn(spark, SF_DIR).toPandas()
    release_cached()
    problems = spec.py_oracle(pdf, SF_DIR)
    assert problems == []


@pytest.mark.parametrize("name", sorted(PY_ORACLES))
def test_py_oracle_detects_divergence(spark, name):
    """Mutate one value of the live result; the checker must flag it."""
    spec = _SPECS[name]
    pdf = spec.fn(spark, SF_DIR).toPandas()
    release_cached()
    bad = pdf.copy()
    col = bad.columns[-1]
    v = bad.loc[0, col]
    bad.loc[0, col] = (
        v + 1 if isinstance(v, (int, np.integer, float, np.floating)) else str(v) + "x"
    )
    assert spec.py_oracle(bad, SF_DIR) != []


def test_py_oracle_detects_missing_row(spark):
    spec = _SPECS["q_ann_ivf"]
    pdf = spec.fn(spark, SF_DIR).toPandas()
    release_cached()
    assert spec.py_oracle(pdf.iloc[1:], SF_DIR) != []


def test_registry_has_no_unchecked_sql_gap():
    """Every rows-only entry is rows-only because NEITHER oracle kind
    can express it; the four from VERDICT r10 item 2 are now Python-
    checked and must stay that way."""
    for name in PY_ORACLES:
        spec = _SPECS[name]
        assert spec.py_oracle is PY_ORACLES[name]
