#!/usr/bin/env python3
"""Extract JPEG frames from videos (reference data_process/video2image.py).

cv2-based (this image ships FFmpeg libraries, not the binary); worker-pool
parallel; supports fps resampling and short-edge resizing. Output naming
matches the training pipeline: ``img_{:05d}.jpg``, 1-based.
"""

import argparse
import os
from multiprocessing.pool import ThreadPool

import cv2


def parse_args():
    p = argparse.ArgumentParser(description='video -> rawframes')
    p.add_argument('src_dir')
    p.add_argument('out_dir')
    p.add_argument('--fps', type=float, default=0,
                   help='resample fps (0 = keep native)')
    p.add_argument('--short-edge', type=int, default=0,
                   help='resize short edge (0 = keep)')
    p.add_argument('--num-workers', type=int, default=8)
    p.add_argument('--ext', default='mp4,avi,mkv,webm')
    p.add_argument('--prefix', default='img_{:05d}.jpg',
                   help='frame filename template (Python format string; '
                        "reference equivalents: 'image_{:04d}.jpg' UCF101, "
                        "'image_{:06d}.jpg' HMDB51, '{:06d}.jpg' SthV2)")
    p.add_argument('--level', type=int, default=2, choices=[1, 2],
                   help='1: videos at src root; 2: class subdirs')
    return p.parse_args()


def extract_one(args):
    src, dst, fps, short_edge, prefix = args
    os.makedirs(dst, exist_ok=True)
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        return src, 0
    native_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    step = native_fps / fps if fps > 0 else 1.0
    idx_out, acc = 0, 0.0
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i >= acc:
            acc += step
            idx_out += 1
            if short_edge > 0:
                h, w = frame.shape[:2]
                scale = short_edge / min(h, w)
                frame = cv2.resize(
                    frame, (int(w * scale + 0.5), int(h * scale + 0.5)),
                    interpolation=cv2.INTER_LINEAR)
            cv2.imwrite(os.path.join(dst, prefix.format(idx_out)), frame)
        i += 1
    cap.release()
    return src, idx_out


def main():
    args = parse_args()
    exts = tuple('.' + e for e in args.ext.split(','))
    jobs = []
    if args.level == 1:
        walker = [(args.src_dir, '', f) for f in os.listdir(args.src_dir)]
    else:
        walker = [(os.path.join(args.src_dir, c), c, f)
                  for c in sorted(os.listdir(args.src_dir))
                  if os.path.isdir(os.path.join(args.src_dir, c))
                  for f in os.listdir(os.path.join(args.src_dir, c))]
    for root, cls, fname in walker:
        if not fname.lower().endswith(exts):
            continue
        name = os.path.splitext(fname)[0]
        dst = os.path.join(args.out_dir, cls, name)
        jobs.append((os.path.join(root, fname), dst, args.fps,
                     args.short_edge, args.prefix))
    with ThreadPool(args.num_workers) as pool:
        for src, n in pool.imap_unordered(extract_one, jobs):
            print(f'{src}: {n} frames')


if __name__ == '__main__':
    main()
