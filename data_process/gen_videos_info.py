#!/usr/bin/env python3
"""List name / frame-count / fps / resolution for a directory tree of videos
(reference data_process/gen_videos_info.py)."""

import argparse
import os

import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src_dir')
    p.add_argument('--out', default='videos_info.txt')
    args = p.parse_args()
    lines = []
    for root, _, files in os.walk(args.src_dir):
        for f in sorted(files):
            if not f.lower().endswith(('.mp4', '.avi', '.mkv', '.webm')):
                continue
            path = os.path.join(root, f)
            cap = cv2.VideoCapture(path)
            if not cap.isOpened():
                lines.append(f'{path} BROKEN')
                continue
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            fps = cap.get(cv2.CAP_PROP_FPS)
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            cap.release()
            rel = os.path.relpath(path, args.src_dir)
            lines.append(f'{rel} {n} {fps:.2f} {w}x{h}')
    with open(args.out, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print(f'wrote {len(lines)} entries to {args.out}')


if __name__ == '__main__':
    main()
