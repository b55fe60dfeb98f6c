"""jax.profiler trace hooks.

The reference has no profiler integration (SURVEY.md section 5:
observability is jax.debug.print convergence traces); on TPU the missing
piece is an XLA trace one can open in TensorBoard/Perfetto. Decks opt in
with ``output: {profile trace: <dir>}`` — every subcommand's device work
then runs under one ``jax.profiler.trace`` capture.
"""
from __future__ import annotations

import contextlib
from pathlib import Path


@contextlib.contextmanager
def maybe_trace(resolved_deck: dict | None):
    """Run the enclosed work under a profiler trace when the deck's
    output section names a trace directory; no-op otherwise."""
    trace_dir = None
    if resolved_deck:
        trace_dir = resolved_deck.get("output", {}).get("profile trace")
    if trace_dir is None:
        yield None
        return
    import jax

    path = Path(trace_dir)
    path.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(path)):
        yield path


def annotate(name: str):
    """Named region for profiler timelines (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
