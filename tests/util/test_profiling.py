"""Profiler trace hook: deck-gated capture produces trace artifacts."""
from __future__ import annotations

import os

import jax.numpy as jnp
import pytest

from cmad_tpu.util.profiling import annotate, maybe_trace


def test_maybe_trace_noop_without_deck_key():
    with maybe_trace({"output": {"path": "x"}}) as p:
        assert p is None
    with maybe_trace(None) as p:
        assert p is None


@pytest.mark.skipif(os.environ.get("CMAD_TEST_PROFILER") != "1",
                    reason="profiler capture takes minutes through the "
                           "device tunnel on this host; set "
                           "CMAD_TEST_PROFILER=1 to run")
def test_maybe_trace_writes_capture(tmp_path):
    trace_dir = tmp_path / "trace"
    deck = {"output": {"path": "x", "profile trace": str(trace_dir)}}
    with maybe_trace(deck) as p:
        assert p == trace_dir
        with annotate("unit-test-region"):
            _ = float(jnp.sum(jnp.arange(16.0) ** 2))
    files = list(trace_dir.rglob("*"))
    assert files, "profiler trace produced no artifacts"
