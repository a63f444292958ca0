#!/usr/bin/env python3
"""Generate random deletions in a genome (reference
test/scripts/make_deletions.py, rebuilt py3). Derived from that reference test-data
script: condensed python3 adaptation, same simulation semantics (aux
tooling, not product code).

usage: make_deletions.py -g genome.fasta -o out [-n nb] [-m min] [-M max]
                         [-s sep] [-N] [-b] [--seed S]

Outputs: <out>.fasta (mutated genome), <out>.del.fasta (deleted sequences,
headers `>deletion_<i> : <chrom>_<newpos>`), and <out>.del.txt (or .del.bed
with -b) with the deletion positions (0-based; txt columns
id/name/pos/length/init.inf/init.sup).
"""

import argparse
import random
import sys


def write_fasta(fh, name, seq, ncol):
    fh.write(">" + name + "\n")
    if ncol > 0:
        for i in range(0, len(seq), ncol):
            fh.write(seq[i : i + ncol] + "\n")
    else:
        fh.write(seq + "\n")


def main():
    parser = argparse.ArgumentParser(prog="make_deletions")
    parser.add_argument("-g", "--genome", required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("-n", "--num", type=int, default=1)
    parser.add_argument("-m", "--min", type=int, default=100)
    parser.add_argument("-M", "--max", type=int, default=500)
    parser.add_argument("-s", "--sep", type=int, default=1,
                        help="min distance between two consecutive deletions")
    parser.add_argument("-N", "--enableN", action="store_true",
                        help="allow N inside the deletion (but not the borders)")
    parser.add_argument("-b", "--bed", action="store_true")
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()
    if args.seed is not None:
        random.seed(args.seed)
    sep = max(args.sep, 0)
    if args.min <= 0 or args.max < args.min:
        print("Error in parameters : deletion length must respect "
              "0 < min_length <= max_length")
        return 2
    if args.num <= 0:
        print("Error in parameters : number of deletions should be greater than 0")
        return 2

    # read genome: per-chromosome sequences, keep fasta width
    names, seqs, ncol = [], [], 0
    with open(args.genome) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                names.append(line.lstrip(">"))
                seqs.append([])
            else:
                seqs[-1].append(line.upper())
                ncol = max(ncol, len(line))
    seqs = ["".join(s) for s in seqs]

    # place deletions: non-overlapping + separator, no N at the borders
    # (nor inside unless -N); keep per-chromosome sorted interval lists
    placed = {i: [] for i in range(len(seqs))}
    nb_ok = nb_loop = 0
    while nb_ok < args.num and nb_loop < 20 * args.num:
        nb_loop += 1
        ci = random.randrange(len(seqs))
        seq = seqs[ci]
        dlen = random.randint(args.min, args.max)
        if len(seq) < dlen + 2 * sep + 2:
            continue
        left = random.randint(sep, len(seq) - dlen - sep - 1)
        right = left + dlen
        if any(left - sep < e + sep and right + sep > b - sep for b, e in placed[ci]):
            continue
        borders = seq[left - sep : left + sep] + seq[right - sep : right + sep]
        if "N" in borders:
            continue
        if not args.enableN and "N" in seq[left - sep : right + sep]:
            continue
        placed[ci].append((left, right))
        nb_ok += 1
    if nb_ok < args.num:
        print("Warning: too difficult to place %d deletions, only %d placed"
              % (args.num, nb_ok))

    out_fa = open(args.output + ".fasta", "w")
    out_del = open(args.output + ".del.fasta", "w")
    out_pos = open(args.output + (".del.bed" if args.bed else ".del.txt"), "w")
    if not args.bed:
        out_pos.write("id\tname\tpos\tlength\tinit.inf\tinit.sup\n")

    compt = 0
    for ci, name in enumerate(names):
        seq = seqs[ci]
        new_parts = []
        cursor = 0
        new_pos = 0
        for left, right in sorted(placed[ci]):
            new_parts.append(seq[cursor:left])
            new_pos += left - cursor
            compt += 1
            write_fasta(out_del, "deletion_%d : %s_%d" % (compt, name, new_pos),
                        seq[left:right], ncol)
            if args.bed:
                out_pos.write("%s\t%d\t%d\t%d\t%d\t%d\n"
                              % (name, new_pos, new_pos + 1, compt, right - left, left, right))
            else:
                out_pos.write("%d\t%s\t%d\t%d\t%d\t%d\n"
                              % (compt, name, new_pos, right - left, left, right))
            cursor = right
        new_parts.append(seq[cursor:])
        write_fasta(out_fa, name, "".join(new_parts), ncol)

    out_fa.close()
    out_del.close()
    out_pos.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
