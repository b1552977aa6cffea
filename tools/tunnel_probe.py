"""Tunnel cost decomposition: what does ONE device program call cost?

The batched pipeline's binding lanes (rec / TSR) are suspected to be
per-call-RTT-bound rather than device-compute-bound (docs/performance.md,
round 4). This probe measures the client-side primitives in isolation so
the fix targets the real cost:

  - dispatch_overhead : wall per jitted call when N calls queue back-to-back
                        on device-resident args (no transfers), synced once
  - dispatch_serial   : wall per call when each call is followed by a
                        scalar-reduce sync (exposes per-call RTT)
  - h2d_small         : jax.device_put of a 4 KB host array (arg staging,
                        e.g. per-sub-batch warp matrices)
  - h2d_small_block   : same but block_until_ready'd each time
  - d2h_small         : np.asarray of a device scalar/1 KB result (the
                        blocking download every lane pays per sub-batch)
  - d2h_256k / d2h_4m : packed-result-sized downloads (rec_packed, TSR
                        packed, layout candidates are 100 KB - 4 MB)
  - d2h_async_hit     : np.asarray after copy_to_host_async + compute gap
                        (is the prefetch actually a local hit?)

Run on the quiet chip (not concurrently with bench.py).
"""
from __future__ import annotations

import json
import time

import numpy as np


def timeit(fn, n=12, warm=2):
    for _ in range(warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000  # ms


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}")
    out = {}

    # a tiny compute program on a device-resident arg
    x = jax.device_put(np.ones((128, 128), np.float32))
    tiny = jax.jit(lambda a: a * 1.0001 + 0.5)
    reduce_scalar = jax.jit(lambda a: jnp.sum(a))
    _ = np.asarray(tiny(x))  # compile
    _ = float(reduce_scalar(x))

    # 1) queued dispatch: N calls chained, one sync at the end
    def queued(n=32):
        h = x
        t0 = time.perf_counter()
        for _ in range(n):
            h = tiny(h)
        _ = float(reduce_scalar(h))
        return (time.perf_counter() - t0) / n * 1000

    out["dispatch_queued_ms_per_call"] = round(
        min(queued() for _ in range(3)), 3)

    # 2) serial dispatch: sync after every call
    def serial_once():
        h = tiny(x)
        _ = float(reduce_scalar(h))

    out["dispatch_serial_ms_per_call"] = round(timeit(serial_once), 3)

    # 3) H2D small (arg staging)
    small = np.ones((32, 32), np.float32)

    out["h2d_small_enqueue_ms"] = round(
        timeit(lambda: jax.device_put(small)), 3)
    out["h2d_small_block_ms"] = round(
        timeit(lambda: jax.block_until_ready(jax.device_put(small))), 3)

    # how do K enqueued device_puts pipeline?
    def h2d_burst(k=16):
        t0 = time.perf_counter()
        hs = [jax.device_put(small) for _ in range(k)]
        for h in hs:
            jax.block_until_ready(h)
        return (time.perf_counter() - t0) / k * 1000

    out["h2d_small_burst_ms_per_put"] = round(
        min(h2d_burst() for _ in range(3)), 3)

    # 4) D2H blocking downloads at lane-realistic sizes
    for label, shape in (("d2h_1k", (16, 16)), ("d2h_256k", (256, 256)),
                         ("d2h_4m", (1024, 1024))):
        h = tiny(jax.device_put(np.ones(shape, np.float32))) \
            if shape != (128, 128) else tiny(x)
        jax.block_until_ready(h)
        out[f"{label}_ms"] = round(timeit(lambda h=h: np.asarray(h)), 3)

    # 5) does copy_to_host_async make the later asarray a local hit?
    big = jax.jit(lambda a: a + 1.0)
    hb = big(jax.device_put(np.ones((1024, 1024), np.float32)))
    jax.block_until_ready(hb)

    def async_then_read():
        h = big(hb)
        try:
            h.copy_to_host_async()
        except Exception:
            pass
        time.sleep(0.15)          # lane does other work meanwhile
        t0 = time.perf_counter()
        _ = np.asarray(h)
        return (time.perf_counter() - t0) * 1000

    out["d2h_4m_after_async_ms"] = round(
        min(async_then_read() for _ in range(6)), 3)

    # 6) two programs back-to-back vs one fused-equivalent (dispatch save)
    f1 = jax.jit(lambda a: jnp.tanh(a) * 2.0)
    f2 = jax.jit(lambda a: jnp.tanh(jnp.tanh(a) * 2.0) * 2.0)
    _ = np.asarray(f1(x)); _ = np.asarray(f2(x))

    def two_calls():
        h = f1(f1(x))
        _ = float(reduce_scalar(h))

    def one_call():
        h = f2(x)
        _ = float(reduce_scalar(h))

    out["two_small_programs_ms"] = round(timeit(two_calls), 3)
    out["one_fused_program_ms"] = round(timeit(one_call), 3)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
