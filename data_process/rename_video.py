#!/usr/bin/env python3
"""Normalize video filenames (strip youtube time suffix variants etc.,
reference data_process/rename_video.py)."""

import argparse
import os
import re


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src_dir')
    p.add_argument('--dry-run', action='store_true')
    args = p.parse_args()
    pat = re.compile(r'^(.*)_(\d{6})_(\d{6})(\.\w+)$')
    for root, _, files in os.walk(args.src_dir):
        for f in files:
            m = pat.match(f)
            if not m:
                continue
            base, start, end, ext = m.groups()
            new = f'{base}_{int(start):06d}_{int(end):06d}{ext}'
            if new != f:
                print(f'{f} -> {new}')
                if not args.dry_run:
                    os.rename(os.path.join(root, f),
                              os.path.join(root, new))


if __name__ == '__main__':
    main()
