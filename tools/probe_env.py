"""Probe the TPU tunnel's health before trusting any wall-clock number.

This container reaches its TPU chip through a tunnel whose two failure
modes have repeatedly contaminated measurements (RESULTS.md):

- the remote-compile service wedges: cached programs keep running while
  ANY novel-shape compile hangs for tens of minutes;
- the execute/fetch path degrades: host value fetches that normally pay
  a ~25-30 ms round trip stretch to seconds, inflating every end-to-end
  wall time ~10x (device step time, measured by slope timing or the
  profiler, is unaffected).

Run this first; if either probe is red, wait and re-probe rather than
debugging your code or recording numbers.

    python tools/probe_env.py [--timeout=60]
"""

import argparse
import threading
import time


def _run_with_timeout(fn, timeout):
    out = {}

    def target():
        try:
            out["value"] = fn()
        except Exception as e:  # noqa: BLE001 - report, don't crash
            out["error"] = repr(e)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        return None, "TIMEOUT after %.0fs" % timeout
    if "error" in out:
        return None, out["error"]
    return out["value"], None


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--timeout", type=float, default=60.0)
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    print("device: %s  (init %.1fs)" % (dev, time.time() - t0))

    # Unusual shape, varied widely per run (PID + time), so the probe
    # cannot go green off the compile cache once a handful of shapes
    # have been seen.
    import os as _os
    shape = (977 + (_os.getpid() + int(time.time())) % 97,
             509 + int(time.time() * 13) % 89)

    def novel_compile():
        t = time.time()
        x = jnp.ones(shape) @ jnp.ones((shape[1], 251))
        float(x[0, 0])
        return time.time() - t

    val, err = _run_with_timeout(novel_compile, args.timeout)
    if err:
        print("compile+run probe: RED (%s) — remote compile service "
              "likely wedged; cached programs may still run" % err)
    else:
        print("compile+run probe: ok (%.1fs)" % val)

    def fetch_rt():
        y = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        float(y[0, 0])  # warm/compile
        ts = []
        for _ in range(5):
            t = time.time()
            y = jnp.ones((8, 8)) @ jnp.ones((8, 8))
            float(y[0, 0])
            ts.append(time.time() - t)
        return float(np.median(ts))

    val, err = _run_with_timeout(fetch_rt, args.timeout)
    if err:
        print("fetch probe: RED (%s)" % err)
    elif val > 0.3:
        print("fetch probe: DEGRADED (%.0f ms round trip; normal is "
              "25-30 ms) — wall-clock numbers will read ~%dx slow"
              % (1e3 * val, max(2, int(val / 0.03))))
    else:
        print("fetch probe: ok (%.0f ms round trip)" % (1e3 * val))

    def bandwidth():
        import numpy as np
        arr = np.ones((64, 512, 512), np.float32)  # 67 MB
        t = time.time()
        d = jax.device_put(arr)
        # block_until_ready does NOT synchronize on this stack
        # (utils/timing.py); a scalar fetch is the only honest sync.
        float(d[0, 0, 0])
        up = time.time() - t
        t = time.time()
        np.asarray(d)
        down = time.time() - t
        return arr.nbytes / max(up, 1e-9) / 1e6, \
            arr.nbytes / max(down, 1e-9) / 1e6

    val, err = _run_with_timeout(bandwidth, args.timeout)
    if err:
        print("transfer probe: RED (%s)" % err)
    else:
        print("transfer probe: host->device %.0f MB/s, device->host "
              "%.0f MB/s" % val)


if __name__ == "__main__":
    main()
