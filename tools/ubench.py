"""Scan-slope micro-benchmark helper for the axon TPU relay.

Per-call wall timing lies through the relay (dispatch acks before
execution), so the only honest timing is N data-dependent chained steps
inside one jitted lax.scan, differencing two scan lengths.  Same method as
bench.py, packaged for arbitrary functions.
"""

from __future__ import annotations

import contextlib
import signal
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/canonswap_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _perturb(carry, chk):
    # NOT 0.0*chk: XLA's algebraic simplifier folds that to 0 and then hoists
    # the whole body out of the scan (observed: 0.01ms "convs").  1e-38*chk
    # is numerically zero after rounding into O(1) carries but unfoldable.
    def f(a):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a + (1e-38 * chk).astype(a.dtype)
        return a

    return jax.tree.map(f, carry)


def scan_slope_time(fn, inputs, n_long: int = 4, n_short: int = 1,
                    reps: int = 2) -> float:
    """Seconds per single application of ``fn(*inputs)`` on device.

    ``inputs`` is a tuple of arrays/pytrees; iteration i+1's inputs depend on
    iteration i's outputs via a zero-scaled checksum, forcing serialization.
    """

    def make(n):
        @jax.jit
        def run(inputs):
            def body(carry, _):
                out = fn(*carry)
                leaves = [
                    jnp.mean(x.astype(jnp.float32))
                    for x in jax.tree.leaves(out)
                    if hasattr(x, "astype")
                ]
                chk = jnp.sum(jnp.stack(leaves))
                return _perturb(carry, chk), chk

            _, chks = jax.lax.scan(body, inputs, None, length=n)
            return jnp.sum(chks)

        return run

    run_long, run_short = make(n_long), make(n_short)

    def t(run):
        t0 = time.perf_counter()
        v = float(run(inputs))
        assert v == v, "NaN checksum"
        return time.perf_counter() - t0

    t(run_short)  # compile
    t(run_long)
    ts = min(t(run_short) for _ in range(reps))
    tl = min(t(run_long) for _ in range(reps))
    return (tl - ts) / (n_long - n_short)


class ProbeTimeout(Exception):
    pass


@contextlib.contextmanager
def probe_timeout(seconds: int):
    """SIGALRM-based per-probe timeout so ONE hung remote compile records
    an error and the harness moves on (a blocked socket read in the relay
    client is interruptible; a wedged relay then fails the later probes
    fast, which is the record we want)."""

    def _raise(signum, frame):
        raise ProbeTimeout(f"probe exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )
