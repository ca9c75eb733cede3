#!/usr/bin/env python3
"""Generate train/val annotation lists for the supported datasets.

Functional equivalent of the reference's ``data_process/gen_label.py:9-282``:
consumes the official label maps / split files (csv / json / txt) for
UCF101, HMDB51, Kinetics-400/600/700 and Something-Something V1/V2 and
writes ``datalist/<dataset>/`` files in the framework's annotation formats:

- rawframes source: ``<dir> <total_frames> <label>``
- video source:     ``<file> <label>``

Frame counts are taken by listing the extracted frame directories.
"""

import argparse
import csv
import json
import os
import os.path as osp


def parse_args():
    parser = argparse.ArgumentParser(description='Build file label list')
    parser.add_argument('data_path', help='root dir with frames/videos')
    parser.add_argument('dataset', choices=[
        'ucf101', 'hmdb51', 'kinetics400', 'kinetics600', 'kinetics700',
        'sthv1', 'sthv2'])
    parser.add_argument('--ann_root', default='annotation')
    parser.add_argument('--out_root', default='../datalist')
    parser.add_argument('--phase', default='train', choices=['train', 'val'])
    parser.add_argument('--level', type=int, default=2, choices=[1, 2])
    parser.add_argument('--source', default='rgb',
                        choices=['rgb', 'flow', 'video'])
    parser.add_argument('--split', type=int, default=1, choices=[1, 2, 3])
    return parser.parse_args()


def normalize_kinetics_name(name: str) -> str:
    return (name.strip().replace(' ', '_').replace('"', '')
            .replace('(', '').replace(')', '').replace("'", ''))


def parse_label_file(path):
    """label map file -> {category: index}."""
    categories = []
    with open(path) as f:
        if path.endswith('json'):
            data = json.load(f)
            for i, (cat, idx) in enumerate(data.items()):
                assert i == int(idx)
                categories.append(cat)
        elif 'kinetics' in path:
            categories = [normalize_kinetics_name(c) for c in f]
        else:
            categories = [line.rstrip() for line in f]
    if 'sthv1' in path:
        categories = sorted(categories)
    return {c: i for i, c in enumerate(categories)}


def count_frames(frame_dir: str) -> int:
    try:
        return len([f for f in os.listdir(frame_dir)
                    if f.endswith(('.jpg', '.jpeg', '.png'))])
    except FileNotFoundError:
        return 0


def write_list(entries, out_file):
    os.makedirs(osp.dirname(out_file), exist_ok=True)
    with open(out_file, 'w') as f:
        f.write('\n'.join(entries) + '\n')
    print(f'wrote {len(entries)} entries to {out_file}')


def gen_sth(args):
    ann = osp.join(args.ann_root, args.dataset)
    if args.dataset == 'sthv2':
        labels = parse_label_file(
            osp.join(ann, 'something-something-v2-labels.json'))
        src = osp.join(ann, f'something-something-v2-{args.phase}ation.json'
                       if args.phase == 'val'
                       else 'something-something-v2-train.json')
        with open(src) as f:
            data = json.load(f)
        items = [(item['id'],
                  labels[item['template'].replace('[', '').replace(']', '')])
                 for item in data]
    else:
        labels = parse_label_file(
            osp.join(ann, 'something-something-v1-labels.csv'))
        src = osp.join(ann, f'something-something-v1-'
                            f'{"validation" if args.phase == "val" else "train"}.csv')
        items = []
        with open(src) as f:
            for row in csv.reader(f, delimiter=';'):
                items.append((row[0], labels[row[1]]))
    entries = []
    for vid, label in items:
        if args.source == 'video':
            entries.append(f'{vid}.webm {label}')
        else:
            n = count_frames(osp.join(args.data_path, vid))
            if n > 0:
                entries.append(f'{vid} {n} {label}')
    write_list(entries, osp.join(args.out_root, args.dataset,
                                 f'{args.phase}_{args.source}.txt'))


def gen_ucf_hmdb(args):
    ann = osp.join(args.ann_root, args.dataset)
    if args.dataset == 'ucf101':
        labels = {}
        with open(osp.join(ann, 'classInd.txt')) as f:
            for line in f:
                idx, name = line.split()
                labels[name] = int(idx) - 1
        split_file = osp.join(
            ann, f'{"train" if args.phase == "train" else "test"}list'
                 f'{args.split:02d}.txt')
        with open(split_file) as f:
            vids = [line.split()[0].rsplit('.', 1)[0] for line in f
                    if line.strip()]
        items = [(v, labels[v.split('/')[0]]) for v in vids]
    else:  # hmdb51
        items = []
        classes = sorted(
            fn[:-len(f'_test_split{args.split}.txt')]
            for fn in os.listdir(ann)
            if fn.endswith(f'_test_split{args.split}.txt'))
        label_map = {c: i for i, c in enumerate(classes)}
        tag = '1' if args.phase == 'train' else '2'
        for cls in classes:
            with open(osp.join(ann,
                               f'{cls}_test_split{args.split}.txt')) as f:
                for line in f:
                    name, t = line.split()
                    if t == tag:
                        items.append((f'{cls}/{name.rsplit(".", 1)[0]}',
                                      label_map[cls]))
    entries = []
    for vid, label in items:
        if args.source == 'video':
            entries.append(f'{vid}.avi {label}')
        else:
            n = count_frames(osp.join(args.data_path, vid))
            if n > 0:
                entries.append(f'{vid} {n} {label}')
    write_list(entries, osp.join(args.out_root, args.dataset,
                                 f'{args.phase}_{args.source}'
                                 f'_split{args.split}.txt'))


def gen_kinetics(args):
    ann = osp.join(args.ann_root, args.dataset)
    labels = parse_label_file(osp.join(ann, 'label_map.txt'))
    src = osp.join(ann, f'kinetics_{args.phase}.csv')
    entries = []
    with open(src) as f:
        for row in csv.DictReader(f):
            cls = normalize_kinetics_name(row['label'])
            ident = (f"{row['youtube_id']}_{int(row['time_start']):06d}"
                     f"_{int(row['time_end']):06d}")
            rel = f'{cls}/{ident}' if args.level == 2 else ident
            label = labels[cls]
            if args.source == 'video':
                entries.append(f'{rel}.mp4 {label}')
            else:
                n = count_frames(osp.join(args.data_path, rel))
                if n > 0:
                    entries.append(f'{rel} {n} {label}')
    write_list(entries, osp.join(args.out_root, args.dataset,
                                 f'{args.phase}_{args.source}.txt'))


def main():
    args = parse_args()
    if args.dataset.startswith('sth'):
        gen_sth(args)
    elif args.dataset in ('ucf101', 'hmdb51'):
        gen_ucf_hmdb(args)
    else:
        gen_kinetics(args)


if __name__ == '__main__':
    main()
