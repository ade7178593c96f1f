"""Probe: does the active JAX backend's host→device transfer layer leak
host memory per upload?

Motivation (docs/PERFORMANCE.md "Host memory"): the sandbox's TPU RPC
tunnel retains host RAM ≈ every uploaded buffer (`device_put(4MB)+del`
grows RSS 4 MB/iteration while `jax.live_arrays()` stays constant), which
OOM-kills long training runs. This probe quantifies the per-upload growth
so a deployment can decide whether segmented training
(`train(stop_after_epoch=...)` / `--segment-epochs`) is needed.

Run: python tools/probe_transfer_leak.py [--mb 4] [--iters 150]
Healthy backend: "leak per upload" ≈ 0. This tunnel: ≈ the payload.
"""

from __future__ import annotations

import argparse
import gc


def rss_mb() -> float:
    # current RSS (not ru_maxrss — that's a monotonic high-water mark and
    # over-reports transient allocator growth as a leak)
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=4.0, help="payload MB")
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--cpu", action="store_true",
                    help="probe the CPU backend instead (control)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    n = int(args.mb * (1 << 20) / 4)
    x = np.random.rand(n).astype(np.float32)
    f = jax.jit(lambda a: a.sum())
    float(f(jax.device_put(x)))  # compile + first transfer outside the window
    gc.collect()
    r0, half = rss_mb(), args.iters // 2
    r_mid = r0
    for i in range(args.iters):
        d = jax.device_put(x)
        s = f(d)
        del d, s
        if i == half:
            gc.collect()
            r_mid = rss_mb()
    gc.collect()
    r1 = rss_mb()
    # measure over the second half: warm allocator, no compile effects
    per_upload = (r1 - r_mid) / (args.iters - half)
    print(f"backend={jax.devices()[0].platform} payload={args.mb:.1f}MB "
          f"iters={args.iters}")
    print(f"rss start/mid/end: {r0:.0f}/{r_mid:.0f}/{r1:.0f} MB")
    print(f"leak per upload: {per_upload:.2f} MB "
          f"({per_upload / args.mb * 100:.0f}% of payload)")


if __name__ == "__main__":
    main()
