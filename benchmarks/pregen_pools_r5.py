"""Pre-generate the synthetic-volume disk cache for the round-5 ladder runs.

The synth cache (/tmp/vqvdb_synth_v1) is cleared between driver sessions;
regenerating the 10x velocity pool (1800 volumes, ~5-8 s each on this
1-core host) inline would serialize ~2.5 h of CPU work in front of the TPU
ladder run. This script warms the cache in the background so the ladder
invocation hits it.

    python benchmarks/pregen_pools_r5.py --velocity 1800 --eval-velocity

Generation is deterministic in (family, size, seed) — cached bits == fresh
bits (train/synthetic.py docstring).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--velocity", type=int, default=0,
                    help="velocity train volumes to warm (train_seeds)")
    ap.add_argument("--smoke", type=int, default=0)
    ap.add_argument("--levelset", type=int, default=0)
    ap.add_argument("--eval-velocity", action="store_true",
                    help="warm the 50k-block velocity eval pool (seeds 1000+)")
    args = ap.parse_args()

    from vqvdb_tpu.train.synthetic import (levelset_grid, smoke_grid,
                                           train_seeds, velocity_grid)

    t0 = time.time()
    done = 0

    def tick(what: str) -> None:
        nonlocal done
        done += 1
        if done % 50 == 0:
            print(f"[pregen] {done} volumes ({what}) "
                  f"{time.time() - t0:.0f}s", flush=True)

    for s in train_seeds(args.velocity):
        velocity_grid(96, seed=s)
        tick(f"velocity {s}")
    for s in train_seeds(args.smoke):
        smoke_grid(96, seed=s)
        tick(f"smoke {s}")
    for s in range(5000, 5000 + args.levelset):
        levelset_grid(96, seed=s)
        tick(f"levelset {s}")
    if args.eval_velocity:
        total, seed = 0, 1000
        while total < 50_000:
            total += velocity_grid(96, seed=seed).num_leaves
            seed += 1
            tick(f"eval velocity {seed}")
        print(f"[pregen] eval velocity: {total} blocks through seed {seed}")
    print(f"[pregen] done: {done} volumes in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
