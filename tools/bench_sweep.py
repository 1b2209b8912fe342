"""Geometry sweep for synthesis throughput: same total samples, different
(batch x seconds) splits.  Longer clips raise T at the deep blocks (better
MXU shapes, fewer kernel launches per audio-second); more batch rows raise
parallelism.  RTF = total audio / wall is invariant to the split, so the
best cell is simply the fastest.

Runs bench.py in-process per cell to reuse the persistent compile cache.
"""

from __future__ import annotations

import os
import subprocess
import sys

CELLS = [
    (96, 4), (48, 8), (24, 16), (128, 4), (64, 8), (96, 8),
]


def main() -> None:
    for batch, seconds in CELLS:
        env = dict(os.environ)
        env["BENCH_BATCH"] = str(batch)
        env["BENCH_SECONDS"] = str(seconds)
        env["BENCH_ITERS"] = os.environ.get("BENCH_ITERS", "3")
        r = subprocess.run([sys.executable, "bench.py"], env=env,
                           capture_output=True, text=True, timeout=1200)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        note = [l for l in r.stderr.splitlines() if "best" in l]
        print(f"b{batch} x {seconds}s: {line}  {note[-1] if note else ''}",
              flush=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], flush=True)


if __name__ == "__main__":
    main()
