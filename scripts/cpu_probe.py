#!/usr/bin/env python
"""Host-speed probe for the measurement-noise protocol (BASELINE.md).

This VM sits on a shared host with bursty vCPU steal that the guest
cannot see in load average or vmstat (idle shows 100 %, steal 0 —
measured during a 4.6x-degraded window on 2026-08-15). The only
reliable in-guest signal is wall-clock on a fixed CPU-bound loop:

    python scripts/cpu_probe.py          # one-shot: prints seconds
    python scripts/cpu_probe.py --wait   # block until quiet, then exit 0

Reference points on this box (Python 3.x, 10M-iteration int loop):
  ~0.34 s  = quiet host (floor-grade measurements are trustworthy)
  >0.6 s   = degraded; bench totals inflate roughly proportionally
  ~1.6 s   = the 4.6x episode that inflated dedup_pipeline_keep_best
             25.1 s solo vs its ~7 s floor (code unchanged)

Protocol: probe BEFORE and AFTER a floor run; if either side is
>1.3x the quiet reference, the run is not floor-grade. --wait polls
every 60 s until three consecutive probes are under the threshold
(default 0.45 s), for gating an unattended floor refresh.
"""

from __future__ import annotations

import sys
import time

QUIET_SEC = 0.45
N_ITER = 10_000_000


def probe() -> float:
    t = time.perf_counter()
    s = 0
    for i in range(N_ITER):
        s += i
    return time.perf_counter() - t


def main() -> None:
    if "--wait" in sys.argv:
        streak = 0
        while streak < 3:
            p = probe()
            streak = streak + 1 if p < QUIET_SEC else 0
            print(f"probe {p:.3f}s streak {streak}/3", flush=True)
            if streak < 3:
                time.sleep(60)
        return
    print(f"{probe():.3f}")


if __name__ == "__main__":
    main()
