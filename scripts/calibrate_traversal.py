#!/usr/bin/env python3
"""Calibrate TraversalPolicy against the reference's committed per-job oracles.

Oracles (reference test data):
- test/full_test/gold_bed.info.txt : 3 breakpoint jobs -> nodes / nt / nterm
- test/contig_test/gold.info.txt   : 18 contig-seed jobs -> nodes / nt / nterm

Usage: python scripts/calibrate_traversal.py [--contig] [--combos N]
"""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from mindthegap_tpu.graph import dbg
from mindthegap_tpu.io.bank import Bank
from mindthegap_tpu.fill.traversal import GraphView, TraversalPolicy, construct_linear_seqs
from mindthegap_tpu.fill.runner import find_nodes_containing_multiple_r
from mindthegap_tpu.utils import dna

REF = "/root/reference"
CACHE = "/tmp/mtg_calib"
os.makedirs(CACHE, exist_ok=True)


def get_graph(name, uri, amin):
    path = os.path.join(CACHE, name + ".h5")
    if not os.path.exists(path):
        g = dbg.build_graph(uri, 31, amin)
        g.save(path)
    return dbg.Graph.load(path)


def bkpt_jobs():
    """(name, L, R, target_dict) for the 3 gold_bed breakpoints."""
    recs = list(Bank.open(os.path.join(CACHE, "bed_test.breakpoints")))
    jobs = []
    for i in range(0, len(recs), 2):
        L, Rr = recs[i], recs[i + 1]
        jobs.append((L.comment_short, L.seq, Rr.seq, {Rr.seq: (Rr.comment_short, False)}))
    return jobs


def contig_jobs():
    k = 31
    overlap = 31
    seeds = []
    all_targets = {}
    for rec in Bank.open(f"{REF}/data/contigs.fasta"):
        cs = rec.seq
        if len(cs) > 2 * overlap + k:
            name = rec.comment_short
            seed_f = cs[len(cs) - (overlap + k) : len(cs) - (overlap + k) + k]
            target_f = cs[overlap : overlap + k]
            rc = dna.revcomp(cs)
            seed_rc = rc[len(rc) - (overlap + k) : len(rc) - (overlap + k) + k]
            target_rc = rc[overlap : overlap + k]
            all_targets.setdefault(target_f, (name, False))
            all_targets.setdefault(target_rc, (name, True))
            seeds.append((name, seed_f))
            seeds.append((name + "_Rc", seed_rc))
    jobs = []
    for name, seed in seeds:
        td = {}
        conc = []
        for tseq, (tname, t_rc) in all_targets.items():
            tmp = tname + "_Rc" if t_rc else tname
            if tmp != name:
                conc.append(tseq)
                td[tseq] = (tname, t_rc)
        jobs.append((name, seed, "".join(conc), td))
    return jobs


def parse_gold_info(path):
    rows = {}
    for line in open(path):
        parts = line.rstrip("\n").split("\t")
        name = parts[0]
        nums = [p for p in parts[1:] if p.strip() != ""]
        rows[name] = tuple(int(x) for x in nums[:3])
    return rows


def eval_policy(pol, jobs, graph, view, gold, verbose=False):
    ok = 0
    details = []
    for name, L, R, tdict in jobs:
        contigs = construct_linear_seqs(graph, L, R, 10000, 100, swf=True, policy=pol, view=view)
        nodes = len(contigs)
        nt = sum(len(c) for c in contigs)
        term = find_nodes_containing_multiple_r(31, tdict, contigs, 2)
        got = (nodes, nt, len(term))
        # gold key: bed info rows are keyed by a renumbered bkpt id; match by suffix
        gkey = name
        if gkey not in gold:
            for gk in gold:
                if gk.split("_", 1)[-1] == name.split("_", 1)[-1]:
                    gkey = gk
                    break
        want = gold.get(gkey)
        match = want == got
        ok += match
        details.append((name, got, want, match))
    if verbose:
        for name, got, want, m in details:
            print(f"  {'OK ' if m else 'XX '} {name}: got={got} want={want}")
    return ok, details


def main():
    do_contig = "--contig" in sys.argv
    verbose = "--verbose" in sys.argv

    g_full = get_graph("full", f"{REF}/data/reads_r1.fastq,{REF}/data/reads_r2.fastq", "auto")
    view_full = GraphView(g_full)
    gold_bed = parse_gold_info(f"{REF}/test/full_test/gold_bed.info.txt")
    jobs_bed = bkpt_jobs()

    if do_contig:
        g_cont = get_graph("contig", f"{REF}/data/contig-reads.fasta.gz", 3)
        view_cont = GraphView(g_cont)
        gold_cont = parse_gold_info(f"{REF}/test/contig_test/gold.info.txt")
        jobs_cont = contig_jobs()

    grid = dict(
        in_branch_stop=[True, False],
        start_mark=[True, False],
        passed_branch_mark=[True, False],
        branch_stop_mark=[False, True],
        skip_marked_start=["no", "skip", "kmer"],
        swf_strstr=[False, True],
        lifo=[False, True],
        depth_with_kmer=[True, False],
    )
    keys = list(grid)
    best = []
    t0 = time.time()
    for combo in itertools.product(*(grid[k] for k in keys)):
        pol = TraversalPolicy(**dict(zip(keys, combo)))
        ok, _ = eval_policy(pol, jobs_bed, g_full, view_full, gold_bed)
        if ok == len(jobs_bed):
            score2 = None
            if do_contig:
                ok2, det2 = eval_policy(pol, jobs_cont, g_cont, view_cont, gold_cont)
                score2 = ok2
            best.append((dict(zip(keys, combo)), ok, score2))
    print(f"elapsed {time.time()-t0:.1f}s; {len(best)} combos match all bed rows")
    for b in sorted(best, key=lambda x: -(x[2] or 0))[:40]:
        print(b)
    if not best:
        # show the closest few for diagnosis
        print("no full match; diagnostics for default policy:")
        eval_policy(TraversalPolicy(), jobs_bed, g_full, view_full, gold_bed, verbose=True)


if __name__ == "__main__":
    main()
