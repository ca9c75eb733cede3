#!/usr/bin/env python3
"""Model-zoo throughput grid: the reference's full headline table.

The reference's model zoo (``/root/reference/README.md:52-57``) spans
MVFNet-R50/R101 at 4x16 / 8x8 / 16x4; until round 4 only the R50 8x8
point had measured TPU numbers.  This tool runs the SAME dense-test and
train-step measurements as ``bench.py`` (same model builder, same
chained-timing methodology) across the whole grid and prints one JSON
line per entry:

  {"entry": "r101_8x8", "dense_clips_per_sec": ..., "dense_tflops": ...,
   "train_clips_per_sec": ..., "gflops_per_clip": ...}

``dense_tflops`` is the effective model rate (clips/s x per-clip GFLOPs
from the reference config headers, ``mvf_kinetics400_2d_rgb_r50_dense.py:1-4``
and ``..._r101_dense.py:2-4``) — a sanity line showing each geometry's
MXU utilization.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# (depth, clip_len) -> per-clip GFLOPs, from the reference config headers
# (BASELINE.md rows 7 and 9).
GFLOPS = {
    (50, 4): 16.454, (50, 8): 32.909, (50, 16): 65.817,
    (101, 4): 31.363, (101, 8): 62.726, (101, 16): 125.452,
}
ENTRIES = ['r50_4x16', 'r50_8x8', 'r50_16x4',
           'r101_4x16', 'r101_8x8', 'r101_16x4']


def parse_entry(name):
    depth = int(name.split('_')[0][1:])
    clip_len = int(name.split('_')[1].split('x')[0])
    return depth, clip_len


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--entries', nargs='+', default=ENTRIES,
                   choices=ENTRIES)
    p.add_argument('--skip-train', action='store_true',
                   help='dense-test only (train adds a bwd compile per entry)')
    p.add_argument('--skip-dense', action='store_true')
    args = p.parse_args()

    import bench  # repo-root bench.py: measure() / measure_train()

    for name in args.entries:
        depth, clip_len = parse_entry(name)
        out = {'entry': name, 'gflops_per_clip': GFLOPS[(depth, clip_len)],
               'unit': 'clips/sec/chip'}
        if not args.skip_dense:
            t0 = time.time()
            c, reps = bench.measure(None, (1, 1, 1, 1), depth=depth,
                                    clip_len=clip_len)
            out['dense_clips_per_sec'] = round(c, 2)
            out['dense_reps'] = [round(r, 2) for r in reps]
            out['dense_tflops'] = round(
                c * GFLOPS[(depth, clip_len)] / 1e3, 2)
            out['dense_wall_s'] = round(time.time() - t0, 1)
        if not args.skip_train:
            t0 = time.time()
            tps, t_reps, b = bench.measure_train(clip_len=clip_len,
                                                 depth=depth)
            out['train_clips_per_sec'] = round(tps, 2)
            out['train_reps'] = [round(r, 2) for r in t_reps]
            out['train_batch'] = b
            out['train_wall_s'] = round(time.time() - t0, 1)
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
