"""GlobalResidual operating modes.

Parity: reference ``cmad/global_residuals/modes.py``.
"""
from enum import IntEnum


class GlobalResidualMode(IntEnum):
    COUPLED = 0
    CLOSED_FORM = 1
