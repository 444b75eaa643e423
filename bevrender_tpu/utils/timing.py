"""Device-side timing that survives the remote-TPU tunnel's RPC noise.

The axon tunnel adds several ms of latency noise per dispatch, and
``block_until_ready`` on repeated identical dispatches can be elided, so
the only trustworthy measurement is a jitted ``lax.fori_loop`` whose body
perturbs its input by the loop index, fetched as one scalar, differenced
between two iteration counts (see bench.py, which established the
methodology against the reference's wall-clock protocol,
/root/reference/train.py:289-309).

This module fixes two pitfalls the first stage benches hit:

* **min-of-differences bias**: taking ``min`` over repetitions of
  ``(t(n2) - t(n1)) / (n2 - n1)`` selects the most-negative noise
  excursion and reads *negative* for sub-ms stages.  Here each absolute
  time is min-reduced separately, then differenced once.
* **fixed iteration counts**: a hand-picked ``n`` that is fine for a
  40 ms stage drowns in noise for a 0.2 ms stage.  ``device_bench``
  auto-calibrates ``n`` until the aggregate loop takes ``target_s``
  seconds, so the differenced signal is ~seconds against ~ms noise.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

__all__ = ["device_bench"]


def device_bench(
    fn,
    *args,
    target_s: float = 1.5,
    reps: int = 3,
    max_n: int = 1 << 20,
) -> float:
    """Milliseconds per iteration of ``fn(*args)`` on the default backend.

    ``fn`` must be jit-traceable with static shapes.  The loop body scales
    the first argument by ``1 + i * 1e-9`` (a no-op numerically at low
    precision, but enough to defeat result caching / CSE across
    iterations) and accumulates a single down-scaled scalar so XLA cannot
    dead-code the call.
    """

    @jax.jit
    def loop(args, n):
        def body(i, acc):
            a0 = args[0] * (1.0 + i.astype(jnp.float32) * 1e-9).astype(
                args[0].dtype
            )
            out = fn(a0, *args[1:])
            first = jax.tree_util.tree_leaves(out)[0]
            return acc + jnp.sum(first[..., :1]).astype(jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        float(loop(args, jnp.int32(n)))
        return time.perf_counter() - t0

    timed(1)  # compile (n is traced, one compile serves every count)

    # Calibrate n so the aggregate sits well above tunnel noise.  Growth
    # per step is bounded x8 so one noise-corrupted reading cannot launch
    # n past max_n.
    n = 4
    for _ in range(16):
        t = timed(n)
        if t >= target_s or n >= max_n:
            break
        want = int(n * target_s / max(t, 1e-4)) + 1
        n = min(max_n, max(n * 2, min(want, n * 8)))

    n2, n1 = n, max(1, n // 8)
    t1 = min(timed(n1) for _ in range(reps))
    t2 = min(timed(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1) * 1e3
