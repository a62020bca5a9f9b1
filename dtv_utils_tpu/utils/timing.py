"""Execution-forced timing for remote/lazy JAX backends.

On the axon TPU tunnel, ``jax.block_until_ready`` returns immediately
(dispatch is lazy: work executes when a value is actually fetched) and the
runtime MEMOIZES dispatches — re-running the same executable on the same
input buffers returns a cached result.  A naive

    t0; [fn(x) for _ in range(n)]; jax.block_until_ready(...); t1

therefore measures enqueue rate, not device throughput (observed: "17 TB/s
HBM bandwidth", i.e. >20x the physical roofline).  Honest timing needs
(a) a distinct input for every dispatch, and (b) a value fetch *inside*
the timed region that data-depends on every timed dispatch.

``chain_probe`` builds that dependency: a float32 scalar accumulator that
each timed result feeds; fetching it at the end forces the entire graph.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


@jax.jit
def _probe(acc: jax.Array, x: jax.Array) -> jax.Array:
    """acc + a one-element data probe of x (forces x's computation)."""
    return acc + jax.lax.convert_element_type(x.ravel()[-1], jnp.float32)


def force(values) -> float:
    """Fetch-force a pytree of device values; returns the probe sum."""
    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(values):
        acc = _probe(acc, leaf)
    return float(acc)


def timed_stream(fn: Callable, inputs: Sequence, states: list,
                 warmup: int = 1) -> float:
    """Run ``out, states[s] = fn(inputs[i], states[s])`` round-robin over
    len(states) streams with a distinct input per dispatch, execution-
    forced; returns wall seconds for the timed dispatches (everything
    after the first `warmup` full rounds).

    len(inputs) must be a multiple of len(states); each input is used
    exactly once so the backend's memoization can never serve a cached
    result.
    """
    return sum(timed_segments(fn, inputs, states, warmup=warmup, segments=1))


def timed_segments(fn: Callable, inputs: Sequence, states: list,
                   warmup: int = 1, segments: int = 1) -> list:
    """Like ``timed_stream`` but the timed rounds are split into
    ``segments`` equal, independently-timed groups (each execution-forced
    at its boundary), so callers can report repeat variance — tunnel-
    session noise vs a real regression (BENCH_r03's unexplained swing).
    Returns the list of per-segment wall seconds."""
    n_streams = len(states)
    assert len(inputs) % n_streams == 0
    n_rounds = len(inputs) // n_streams
    timed_rounds = n_rounds - warmup
    assert timed_rounds >= segments > 0, "need >= one round per segment"
    assert timed_rounds % segments == 0, "segments must divide timed rounds"
    it = iter(inputs)
    acc = jnp.float32(0)
    for _ in range(warmup):
        for s in range(n_streams):
            out, states[s] = fn(next(it), states[s])
            for leaf in jax.tree_util.tree_leaves(out):
                acc = _probe(acc, leaf)
    float(acc)                                  # sync: warmup + compiles done
    dts = []
    for _ in range(segments):
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(timed_rounds // segments):
            for s in range(n_streams):
                out, states[s] = fn(next(it), states[s])
                for leaf in jax.tree_util.tree_leaves(out):
                    acc = _probe(acc, leaf)
        force_val = float(acc)                  # forces every timed dispatch
        dts.append(time.perf_counter() - t0)
        assert force_val == force_val           # not NaN — outputs are real
    return dts
