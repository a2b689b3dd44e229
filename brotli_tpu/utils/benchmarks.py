"""Benchmark harness: significance testing + tunnel-aware device timing.

The reference's decode bench builds Welch's t-test comparison into the
benchmark itself (bench/decode.bench.ts:148-177) so speedups are only
reported when statistically significant; `welch_t_test`/`compare_timings`
mirror that machinery.

`time_device_fn` encodes the measurement discipline this environment
forces (see memory: the axon tunnel costs ~16-33 ms per jitted invocation
and `block_until_ready` does not reliably block over it): run the function
REP times inside one jit, force completion with a scalar fetch, and
subtract a trivially-measured round-trip.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass


def welch_t_test(a: list[float], b: list[float]) -> tuple[float, float]:
    """Welch's unequal-variance t-test; returns (t, dof)."""
    na, nb = len(a), len(b)
    if na < 2 or nb < 2:
        raise ValueError(
            f"welch_t_test needs >=2 samples per side (got {na}, {nb})"
        )
    ma = sum(a) / na
    mb = sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    sa, sb = va / na, vb / nb
    denom = math.sqrt(sa + sb) or 1e-12
    t = (ma - mb) / denom
    dof_num = (sa + sb) ** 2
    dof_den = (sa * sa) / (na - 1) + (sb * sb) / (nb - 1)
    dof = dof_num / dof_den if dof_den else float(na + nb - 2)
    return t, dof


@dataclass
class Comparison:
    mean_a: float
    mean_b: float
    speedup: float
    t_stat: float
    dof: float
    significant: bool


def compare_timings(a: list[float], b: list[float],
                    t_critical: float = 2.0) -> Comparison:
    """Compare two timing samples; significant when |t| > t_critical
    (~alpha 0.05 for reasonable sample sizes, as the reference uses).

    Samples too small for a t-test (n < 2) report means only, never
    significance."""
    if not a or not b:
        raise ValueError("compare_timings needs non-empty samples")
    ma = sum(a) / len(a)
    mb = sum(b) / len(b)
    if len(a) < 2 or len(b) < 2:
        return Comparison(
            mean_a=ma, mean_b=mb,
            speedup=ma / mb if mb else float("inf"),
            t_stat=float("nan"), dof=0.0, significant=False,
        )
    t, dof = welch_t_test(a, b)
    return Comparison(
        mean_a=ma, mean_b=mb,
        speedup=ma / mb if mb else float("inf"),
        t_stat=t, dof=dof, significant=abs(t) > t_critical,
    )


def measure_rtt(samples: int = 5) -> float:
    """Round-trip latency of a trivial jitted op (axon tunnel overhead)."""
    import jax
    import jax.numpy as jnp

    trivial = jax.jit(lambda v: v.sum())
    x = jnp.zeros((8, 128), jnp.int32)
    int(trivial(x))
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        int(trivial(x))
        best = min(best, time.perf_counter() - t0)
    return best


def time_device_fn(fn, *args, rep: int = 4, samples: int = 3,
                   rtt: float | None = None, perturb: bool = True) -> float:
    """Best-of-N device time of `fn(*args)` (one jitted call), tunnel-aware.

    `fn` must return a pytree whose first leaf reduces to a scalar-able
    array; REP invocations run inside a single jit.  The first integer leaf
    of `args` is perturbed by the loop index so XLA cannot hoist a pure
    `fn` out of the repeat loop (loop-invariant code motion would otherwise
    time a single run).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    if rtt is None:
        rtt = measure_rtt()

    @jax.jit
    def run_rep(*a):
        def body(i, acc):
            if perturb:
                leaves, treedef = jax.tree.flatten(a)
                for k, leaf in enumerate(leaves):
                    if jnp.issubdtype(leaf.dtype, jnp.integer):
                        leaves[k] = leaf + i.astype(leaf.dtype)
                        break
                a2 = jax.tree.unflatten(treedef, leaves)
            else:
                # side-effecting fns (pallas kernels) cannot be hoisted;
                # perturbation would corrupt semantically-meaningful inputs
                a2 = a
            out = jax.tree.leaves(fn(*a2))[0]
            return acc + out.reshape(-1)[0].astype(jnp.int32) + i
        return lax.fori_loop(0, rep, body, jnp.int32(0))

    int(run_rep(*args))  # compile + warm
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        int(run_rep(*args))
        best = min(best, time.perf_counter() - t0)
    return max(1e-9, (best - rtt) / rep)
