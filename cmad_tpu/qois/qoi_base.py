"""Marker base class shared by every cmad_tpu QoI.

Parity: reference ``cmad/qois/qoi_base.py:15``. The MP and FE QoI
hierarchies share no methods; the registry returns this common type and the
caller dispatches on ``problem_type``.
"""
from __future__ import annotations

from typing import ClassVar


class QoIBase:
    problem_type: ClassVar[str]
