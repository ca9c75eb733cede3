#!/usr/bin/env python3
"""Re-encode videos with short edge 256 (reference data_process/video_resize.py),
cv2 VideoWriter based."""

import argparse
import os
from multiprocessing.pool import ThreadPool

import cv2


def resize_one(args):
    src, dst, short_edge = args
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        return src, False
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    scale = short_edge / min(h, w)
    nw, nh = int(w * scale + 0.5), int(h * scale + 0.5)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    out = cv2.VideoWriter(dst, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                          (nw, nh))
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        out.write(cv2.resize(frame, (nw, nh),
                             interpolation=cv2.INTER_LINEAR))
    cap.release()
    out.release()
    return src, True


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src_dir')
    p.add_argument('out_dir')
    p.add_argument('--short-edge', type=int, default=256)
    p.add_argument('--num-workers', type=int, default=8)
    args = p.parse_args()
    jobs = []
    for root, _, files in os.walk(args.src_dir):
        for f in files:
            if f.lower().endswith(('.mp4', '.avi', '.mkv', '.webm')):
                rel = os.path.relpath(os.path.join(root, f), args.src_dir)
                jobs.append((os.path.join(root, f),
                             os.path.join(args.out_dir, rel),
                             args.short_edge))
    with ThreadPool(args.num_workers) as pool:
        for src, ok in pool.imap_unordered(resize_one, jobs):
            print(f'{src}: {"ok" if ok else "FAILED"}')


if __name__ == '__main__':
    main()
