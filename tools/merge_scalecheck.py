#!/usr/bin/env python3
"""Merge nodes from a TARGETED ScaleCheck run into the committed artifact.

Targeted runs (SPARK_GRAFT_SCALE_ONLY=...) rewrite the WHOLE output file,
leaving untargeted stages empty/-1 — so their output must never replace
SCALECHECK.json directly. This script copies only the named top-level nodes
from the targeted artifact into the committed one, preserving everything
else.

Usage: python3 tools/merge_scalecheck.py <targeted.json> <committed.json> node [node...]
"""
import json, sys


def main():
    src_path, dst_path = sys.argv[1], sys.argv[2]
    nodes = sys.argv[3:]
    src = json.load(open(src_path))
    dst = json.load(open(dst_path))
    for n in nodes:
        if n not in src:
            sys.exit(f"node '{n}' absent from {src_path}")
        dst[n] = src[n]
        print(f"merged {n}")
    with open(dst_path, "w") as f:
        json.dump(dst, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
