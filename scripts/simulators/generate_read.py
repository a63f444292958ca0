#!/usr/bin/env python3
"""Generate random reads from a fasta file (reference
test/scripts/generate_read.py, rebuilt py3). Derived from that reference test-data
script: condensed python3 adaptation, same simulation semantics (aux
tooling, not product code).

usage: generate_read.py -f fasta_file [-n number] [-l length] [--seed S]
"""

import argparse
import random
import sys


def main():
    parser = argparse.ArgumentParser(prog="generate_read")
    parser.add_argument("-f", "--fasta", required=True)
    parser.add_argument("-n", "--num", type=int, default=1)
    parser.add_argument("-l", "--len", type=int, default=1, dest="length")
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()
    if args.seed is not None:
        random.seed(args.seed)

    header = "base_header"
    sequence = []
    with open(args.fasta) as fh:
        for line in fh:
            if line.startswith(">"):
                header = line.lstrip(">").rstrip("\n").rstrip(" ")
            else:
                sequence.append(line.rstrip("\n").upper())
    sequence = "".join(sequence)

    if not sequence:
        print("warning we didn't find fasta sequence in file.")
        return 1
    if len(sequence) < args.length:
        print("warning read length is upper than sequence length we can't generate read.")
        return 1

    for i in range(args.num):
        pos = random.randint(0, len(sequence) - args.length)
        print(">%s_read%d_pos_%d:%d" % (header, i, pos, pos + args.length))
        print(sequence[pos : pos + args.length])
    return 0


if __name__ == "__main__":
    sys.exit(main())
