"""Pre-populate the synthetic-volume cache for round-4 training pools.

Volume generation is 2-6 s/volume on this 1-core host and the cache
(VQVDB_SYNTH_CACHE, train/synthetic.py) makes every later consumer ~1000x
cheaper — so the cache is warmed once, in the background, while other work
proceeds. Seeds follow the retrain_scale_r3.py convention: smoke/velocity
from train_seeds() (skips the reserved eval band [1000, 2000)), levelset
from 5000+; eval pools (seeds 1000+) are generated separately by their
harnesses.

    python benchmarks/gen_pools_r4.py --smoke 900 --levelset 450 \
        --velocity 540 [--eval-blocks 50000]
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
    ap.add_argument("--smoke", type=int, default=900)
    ap.add_argument("--levelset", type=int, default=450)
    ap.add_argument("--velocity", type=int, default=540)
    ap.add_argument("--eval-blocks", type=int, default=0,
                    help="also warm eval pools (seeds 1000+) to this many "
                         "blocks per family")
    ap.add_argument("--size", type=int, default=96)
    args = ap.parse_args()

    from vqvdb_tpu.train.synthetic import (levelset_grid, smoke_grid,
                                           train_seeds, velocity_grid)

    jobs = [("smoke", smoke_grid, train_seeds(args.smoke)),
            ("levelset", levelset_grid,
             list(range(5000, 5000 + args.levelset))),
            ("velocity", velocity_grid, train_seeds(args.velocity))]
    for name, fac, seeds in jobs:
        t0 = time.time()
        done = 0
        for s in seeds:
            fac(args.size, seed=s)
            done += 1
            if done % 50 == 0:
                print(f"[{name}] {done}/{len(seeds)} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        print(f"[{name}] done: {len(seeds)} volumes in "
              f"{time.time() - t0:.0f}s", flush=True)

    if args.eval_blocks:
        for name, fac in (("smoke", smoke_grid), ("levelset", levelset_grid),
                          ("velocity", velocity_grid)):
            total, seed = 0, 1000
            t0 = time.time()
            while total < args.eval_blocks:
                total += fac(args.size, seed=seed).num_leaves
                seed += 1
            print(f"[eval/{name}] {total} blocks (seeds 1000..{seed - 1}) "
                  f"in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
