"""The repo-wide 6dp rounding pin for cross-engine kernel math.

Every NumPy kernel whose rounded values feed a comparison that a DuckDB
contract twin replays (argmin/argmax of rounded distances, ``>=
threshold`` on rounded cosines, rounded MMR margins) MUST round with
:func:`round6` — HALF_UP, ties away from zero — because that is what
both Spark's ``F.round`` and DuckDB's ``round()`` do on doubles.
``np.round`` is banker's half-to-even: on an exact 6dp midpoint it
disagrees with both engines (verified: ``round(2.5e-6::DOUBLE, 6)`` is
``3e-6`` in DuckDB and Spark, ``2e-6`` under ``np.round``), which would
flip an argmin or a threshold comparison versus the twin with no code
change — ``tests/test_rounding.py`` pins the midpoint behavior of all
three engines against this helper.
"""

from __future__ import annotations

import numpy as np


def round6(x):
    """Round to 6 decimal places, HALF_UP (ties away from zero) —
    bit-matching Spark ``F.round(col, 6)`` and DuckDB ``round(v, 6)``
    on float64. Accepts scalars or ndarrays; returns the same shape."""
    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def half_up(x):
    """Round to the nearest integer, HALF_UP (ties away from zero) —
    the integer-valued sibling of :func:`round6`, matching Spark/DuckDB
    ``round(v)`` / ``round(v, 0)`` on float64."""
    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) + 0.5), x)
