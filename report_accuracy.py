#!/usr/bin/env python3
"""Late score fusion CLI — reference ``report_accuracy.py:31-54``: weighted
sum of N score pkls, optional softmax first, then accuracy report."""

import argparse
import pickle

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description='Fuse scores and report')
    parser.add_argument('--scores', nargs='+', required=True,
                        help='score pkl files')
    parser.add_argument('--coefficients', nargs='+', type=float,
                        required=True)
    parser.add_argument('--datalist', required=True,
                        help='annotation file with labels')
    # both spellings: the reference CLI uses --apply-softmax
    # (report_accuracy.py:27), earlier revisions here used --apply_softmax
    parser.add_argument('--apply_softmax', '--apply-softmax',
                        action='store_true')
    return parser.parse_args()


def main():
    args = parse_args()
    from mvfnet_tpu.utils import (get_weighted_score, mean_class_accuracy,
                                  softmax, top_k_accuracy)
    assert len(args.scores) == len(args.coefficients)
    score_list = []
    for path in args.scores:
        with open(path, 'rb') as f:
            scores = [np.asarray(s).reshape(-1) for s in pickle.load(f)]
        score_list.append(scores)
    if args.apply_softmax:
        score_list = [[softmax(s[None])[0] for s in scores]
                      for scores in score_list]
    weighted = get_weighted_score(score_list, args.coefficients)
    labels = []
    with open(args.datalist) as f:
        for line in f:
            if line.strip():
                labels.append(int(line.split()[-1]))
    top1, top5 = top_k_accuracy(np.stack(weighted), labels, k=(1, 5))
    mca = mean_class_accuracy(np.stack(weighted), labels)
    print(f'Top-1 Accuracy = {top1 * 100:.02f}')
    print(f'Top-5 Accuracy = {top5 * 100:.02f}')
    print(f'Mean Class Accuracy = {mca * 100:.02f}')


if __name__ == '__main__':
    main()
