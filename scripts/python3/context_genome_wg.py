#!/usr/bin/env python3
"""Filter likely-false-positive breakpoints by k-mer connectivity context —
equivalent of the reference's scripts/python3/Context_genome_WG.py
(README.txt: drop a breakpoint when more than `1 - threshold` of the 50
k-mers upstream of its left anchor have unusual connectivity, i.e. total
branching degree > 2), using this framework's Graph API in place of pyGATB.

Usage: context_genome_wg.py -g find.h5 -p reference.fa -b find.breakpoints
                            -o filtered.breakpoints [-m threshold(default .80)]
"""

import getopt
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np  # noqa: E402

from mindthegap_tpu.graph.dbg import Graph  # noqa: E402
from mindthegap_tpu.io.bank import Bank  # noqa: E402
from mindthegap_tpu.find import scan  # noqa: E402
from mindthegap_tpu.utils import dna  # noqa: E402

WINDOW = 50  # kmers inspected upstream of the breakpoint


def main(argv):
    opts, _args = getopt.getopt(
        argv, "g:p:b:o:m:", ["graph=", "genome_parser=", "bkpt_file=", "bkpt_outp=", "threshold="]
    )
    graph_path = genome = bkpt_file = out = None
    threshold = 0.80
    for opt, arg in opts:
        if opt in ("-g", "--graph"):
            graph_path = arg
        elif opt in ("-p", "--genome_parser"):
            genome = arg
        elif opt in ("-b", "--bkpt_file"):
            bkpt_file = arg
        elif opt in ("-o", "--bkpt_outp"):
            out = arg
        elif opt in ("-m", "--threshold"):
            threshold = float(arg)
    if not (graph_path and genome and bkpt_file and out):
        print(__doc__)
        return 2

    graph = Graph.load(graph_path)
    k = graph.k
    empty_rep = np.zeros(0, np.uint64)

    # per-chromosome branching-degree planes
    degs = {}
    for rec in Bank.open(genome):
        planes = scan.compute_planes(dna.seq_to_codes(rec.seq), k, graph.solid.kmers, empty_rep)
        degs[rec.comment_short] = planes.nb_in + planes.nb_out

    kept = dropped = 0
    with open(bkpt_file) as fi, open(out, "w") as fo:
        records = fi.read().splitlines()
        for i in range(0, len(records) - 3, 4):
            header_l, seq_l, header_r, seq_r = records[i : i + 4]
            # header: >bkptN_<chrom>_pos_<pos>_...
            tokens = header_l[1:].split("_")
            chrom, pos = tokens[1], int(tokens[3])
            deg = degs.get(chrom)
            ok = True
            if deg is not None:
                lo = max(0, pos - WINDOW)
                window = deg[lo:pos]
                if window.size:
                    unusual = int((window > 2).sum())
                    ok = (1.0 - unusual / window.size) >= threshold
            if ok:
                fo.write("%s\n%s\n%s\n%s\n" % (header_l, seq_l, header_r, seq_r))
                kept += 1
            else:
                dropped += 1
    print(f"kept {kept} breakpoints, filtered {dropped}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
