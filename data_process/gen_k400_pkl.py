#!/usr/bin/env python3
"""Pack rawframe directories into pickled JPEG-bytes lists for PklDataset
(reference data_process/gen_k400_pkl.py). One .pkl per video: [bytes, ...]."""

import argparse
import os
import pickle
from multiprocessing.pool import ThreadPool


def pack_one(args):
    frame_dir, out_file = args
    frames = sorted(f for f in os.listdir(frame_dir)
                    if f.endswith(('.jpg', '.jpeg')))
    blobs = []
    for fn in frames:
        with open(os.path.join(frame_dir, fn), 'rb') as f:
            blobs.append(f.read())
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    with open(out_file, 'wb') as f:
        pickle.dump(blobs, f)
    return frame_dir, len(blobs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('frames_root')
    p.add_argument('out_root')
    p.add_argument('--num-workers', type=int, default=8)
    p.add_argument('--ann', default=None,
                   help='optional rawframes ann list; writes a pkl ann list')
    args = p.parse_args()
    jobs = []
    for root, dirs, files in os.walk(args.frames_root):
        if any(f.endswith(('.jpg', '.jpeg')) for f in files):
            rel = os.path.relpath(root, args.frames_root)
            jobs.append((root, os.path.join(args.out_root, rel + '.pkl')))
    with ThreadPool(args.num_workers) as pool:
        for src, n in pool.imap_unordered(pack_one, jobs):
            print(f'{src}: {n} frames packed')
    if args.ann:
        out_lines = []
        with open(args.ann) as f:
            for line in f:
                if line.strip():
                    d, n, label = line.split()
                    out_lines.append(f'{d}.pkl {n} {label}')
        out = args.ann.replace('.txt', '_pkl.txt')
        with open(out, 'w') as f:
            f.write('\n'.join(out_lines) + '\n')
        print(f'wrote {out}')


if __name__ == '__main__':
    main()
