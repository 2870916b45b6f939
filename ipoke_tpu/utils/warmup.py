"""Remote-compile-service warmup.

Measured on the axon remote-TPU platform (2026-08-17): the FIRST compile in
a process pays a large, highly variable service spin-up cost (16 s warm
machine / 92-452 s cold), after which further compiles are fast (a
30-matmul graph: 0.6-1.5 s).  The persistent compilation cache does NOT
avoid this cost (loading a cached executable still goes through the
service), so the round-2 "compile service degrades by the hour" reading in
NOTES.md was wrong — the hourly swings are this warmup, not per-graph
compile time.

:func:`start` fires a trivial jit compile on a daemon thread so the spin-up
overlaps host-side work (e.g. the ~90 s synth-param init); call
:func:`join` before the first real compile.
"""
import threading
import time


def start():
    """Begin warming the compile service in the background."""
    state = {"t0": time.monotonic(), "elapsed": None}

    def _w():
        try:
            import jax
            import jax.numpy as jnp

            float(jax.jit(lambda x: jnp.sum(x + 1))(jnp.ones((8,))))
            state["elapsed"] = time.monotonic() - state["t0"]
        except Exception:
            pass  # never let warmup failures affect the caller

    t = threading.Thread(target=_w, daemon=True)
    t.start()
    state["thread"] = t
    return state


def join(state, timeout=None):
    """Wait for the warmup compile; returns its elapsed seconds (None if it
    failed or is still running after ``timeout``)."""
    state["thread"].join(timeout)
    return state["elapsed"]


def compile_with_deadline(lowered, deadline_s, what=""):
    """Compile a lowered jit computation with a wall-clock deadline.

    Runs the (blocking) ``lowered.compile()`` in a worker thread and stops
    waiting once ``deadline_s`` (absolute ``time.monotonic()`` value) passes;
    returns the compiled executable, or None on a deadline miss.  The
    abandoned compile thread keeps running (XLA compiles are not
    cancellable) and dies with the process — callers falling back to a
    smaller graph should budget for its CPU contention on small hosts.
    None deadline = plain blocking compile.
    """
    import sys

    if deadline_s is None:
        return lowered.compile()
    remaining = deadline_s - time.monotonic()
    if remaining <= 5:
        print(f"{what}: no budget left, skipping compile", file=sys.stderr)
        return None
    from concurrent.futures import ThreadPoolExecutor
    from concurrent.futures import TimeoutError as FTimeout

    ex = ThreadPoolExecutor(max_workers=1)
    fut = ex.submit(lowered.compile)
    try:
        return fut.result(timeout=remaining)
    except FTimeout:
        print(f"{what}: compile exceeded budget ({remaining:.0f}s left at "
              f"start), abandoning", file=sys.stderr)
        return None
    finally:
        ex.shutdown(wait=False)
