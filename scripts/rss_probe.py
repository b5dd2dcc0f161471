"""Minimal RSS-leak probe for the tunneled TPU transport (VERDICT r3 item 2).

Isolates which traffic direction grows host RSS:
  mode=put    — repeated host->device transfers of fresh numpy arrays
  mode=get    — repeated device->host fetches of a jitted op's output
  mode=both   — put + compute + scalar fetch (the training-loop shape)
  mode=donate — like both, but with donated input buffers
  mode=cached — like both, but re-using ONE pinned numpy buffer

Prints RSS every `report` iterations as JSON lines.
Run: python scripts/rss_probe.py --mode both --iters 400 --mb 10
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="both",
                   choices=["put", "get", "both", "donate", "cached"])
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--mb", type=float, default=10.0)
    p.add_argument("--report", type=int, default=50)
    args = p.parse_args()

    n = int(args.mb * 1e6 / 4)
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "mode": args.mode, "mb": args.mb}))

    @jax.jit
    def f(x):
        return jnp.sum(x * 2.0)

    @jax.jit
    def g(x):
        return x * 2.0  # full-size output for mode=get

    fixed = np.zeros(n, dtype=np.float32)
    rss0 = rss_gb()
    t0 = time.time()
    for i in range(args.iters):
        if args.mode == "cached":
            x = jax.device_put(fixed, dev)
            _ = float(f(x))
        elif args.mode == "put":
            x = jax.device_put(np.full(n, i, dtype=np.float32), dev)
            x.block_until_ready()
        elif args.mode == "get":
            x = jax.device_put(fixed, dev)
            _ = np.asarray(g(x))
        elif args.mode == "donate":
            x = jax.device_put(np.full(n, i % 7, dtype=np.float32), dev)
            _ = float(f(x))
            x.delete()
        else:  # both
            x = jax.device_put(np.full(n, i % 7, dtype=np.float32), dev)
            _ = float(f(x))
        if (i + 1) % args.report == 0:
            print(json.dumps({"iter": i + 1, "rss_gb": round(rss_gb(), 3),
                              "drss_mb": round((rss_gb() - rss0) * 1000, 1),
                              "s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
