#!/usr/bin/env python3
"""Generate deletions each paired with a nearby SNP (reference
test/scripts/make_snp_deletions.py, rebuilt py3). Derived from that reference test-data
script: condensed python3 adaptation, same simulation semantics (aux
tooling, not product code).

usage: make_snp_deletions.py -g genome.fasta -o out [-n nb] [-m min] [-M max]
                             [-s minDistSnp] [-S maxDistSnp] [-d variantDist]
                             [-p b|a|r] [--seed S]

Outputs: <out>.fasta (mutated genome) and <out>.eva (vde truth csv:
`position,type,comment` with types multi_snp / homo).
"""

import argparse
import random
import sys
from collections import OrderedDict


def snp_position(placement, dist_min, dist_max, del_pos):
    if placement == "a":
        return del_pos + random.randint(dist_min, dist_max)
    if placement == "r" and random.random() > 0.5:
        return del_pos + random.randint(dist_min, dist_max)
    return del_pos - random.randint(dist_min, dist_max)


def generate_snp_del(seq, pos_del, pos_snp, del_size):
    nuc = [c for c in "ACTG" if c != seq[pos_snp]]
    seq = seq[:pos_del] + seq[pos_del + del_size :]
    return seq[:pos_snp] + random.choice(nuc) + seq[pos_snp + 1 :]


def main():
    parser = argparse.ArgumentParser(
        prog="make_snp_deletions",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("-g", "--genome", required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("-n", "--number-del", type=int, default=1)
    parser.add_argument("-m", "--min-size-del", type=int, default=100)
    parser.add_argument("-M", "--max-size-del", type=int, default=150)
    parser.add_argument("-s", "--min-dist-snp", type=int, default=5)
    parser.add_argument("-S", "--max-dist-snp", type=int, default=31)
    parser.add_argument("-d", "--variant-dist", type=int, default=232)
    parser.add_argument("-p", "--placement", choices=("b", "a", "r"), default="b")
    parser.add_argument("--seed", type=int, default=None)
    arg = parser.parse_args()
    if arg.seed is not None:
        random.seed(arg.seed)

    if arg.variant_dist <= arg.max_size_del + arg.max_dist_snp:
        print("warning: variant distance is below the max possible variant size",
              file=sys.stderr)

    seqs = OrderedDict()
    comment = ""
    genome_size = 0
    with open(arg.genome) as fh:
        for line in fh:
            if line.startswith(">"):
                comment = line.lstrip(">").split()[0].rstrip()
                seqs.setdefault(comment, "")
            else:
                part = line.rstrip()
                genome_size += len(part)
                seqs[comment] += part

    nuc_per_del = genome_size / arg.number_del

    with open(arg.output + ".eva", "a") as vde_file, \
         open(arg.output + ".fasta", "a") as out_file:
        for comment, seq in seqs.items():
            del_pos = 0
            n_in_seq = 0
            while n_in_seq < len(seq) / nuc_per_del:
                n_in_seq += 1
                del_pos = random.randint(del_pos + arg.variant_dist,
                                         del_pos + arg.variant_dist * 2)
                del_size = random.randint(arg.min_size_del, arg.max_size_del)
                snp_pos = snp_position(arg.placement, arg.min_dist_snp,
                                       arg.max_dist_snp, del_pos)
                if del_pos + del_size > len(seqs[comment]) or snp_pos < 0:
                    print("warning: can't create another deletion in this "
                          "sequence; created %d" % (n_in_seq - 1), file=sys.stderr)
                    break
                seqs[comment] = generate_snp_del(seqs[comment], del_pos, snp_pos, del_size)
                vde_file.write("%s,multi_snp,%s\n" % (snp_pos, comment))
                vde_file.write("%s,homo,%s\n" % (del_pos, comment))
            out_file.write(">%s\n%s\n" % (comment, seqs[comment]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
