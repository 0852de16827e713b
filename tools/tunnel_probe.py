"""Probe the axon tunnel with a tiny cached matmul until it responds.

The remote-compile service can wedge after a client is killed mid-flight
(BENCH_NOTES round-4/5 infra notes); it self-recovers in ~30-60 min. This
probe loop detects recovery: each attempt runs a 128x128 matmul (cached,
so no compile) in a SUBPROCESS with a timeout — a wedged attempt cannot
hang the caller, and a dead subprocess releases the exclusive backend.

Usage: python tools/tunnel_probe.py [--interval 120] [--max_minutes 90]
Exits 0 on first healthy probe, 1 on budget exhausted.
"""
import argparse
import subprocess
import sys
import time

PROBE = (
    "import jax; jax.config.update('jax_compilation_cache_dir', "
    "'/tmp/jax_tpu_cache'); import jax.numpy as jnp; "
    "x = jnp.ones((128, 128)); print('healthy', float((x @ x)[0, 0]))"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=int, default=120)
    ap.add_argument("--max_minutes", type=int, default=90)
    ap.add_argument("--probe_timeout", type=int, default=150)
    args = ap.parse_args()
    t0 = time.time()
    attempt = 0
    while time.time() - t0 < args.max_minutes * 60:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", PROBE], timeout=args.probe_timeout,
                capture_output=True, text=True,
            )
            if r.returncode == 0 and "healthy" in r.stdout:
                print(f"tunnel healthy after {time.time()-t0:.0f}s "
                      f"({attempt} probes)", flush=True)
                return 0
            tail = (r.stderr or r.stdout).strip()[-200:]
            print(f"probe {attempt}: exit {r.returncode}: {tail}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"probe {attempt}: timeout ({args.probe_timeout}s)",
                  flush=True)
        time.sleep(args.interval)
    print("tunnel did not recover in budget", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
