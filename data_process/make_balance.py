#!/usr/bin/env python3
"""Rebalance an annotation list by up-sampling minority classes to the max
class count (reference data_process/make_balance.py)."""

import argparse
import collections
import random


def main():
    p = argparse.ArgumentParser()
    p.add_argument('ann_file')
    p.add_argument('--out', required=True)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()
    random.seed(args.seed)
    by_class = collections.defaultdict(list)
    with open(args.ann_file) as f:
        for line in f:
            if line.strip():
                by_class[line.split()[-1]].append(line.strip())
    target = max(len(v) for v in by_class.values())
    out = []
    for label, lines in by_class.items():
        out.extend(lines)
        extra = target - len(lines)
        out.extend(random.choices(lines, k=extra))
    random.shuffle(out)
    with open(args.out, 'w') as f:
        f.write('\n'.join(out) + '\n')
    print(f'balanced {len(by_class)} classes to {target} each '
          f'-> {len(out)} entries')


if __name__ == '__main__':
    main()
