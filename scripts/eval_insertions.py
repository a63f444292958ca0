#!/usr/bin/env python3
"""eval — insertion recall/precision scorer (reference test/eval.cpp, rebuilt).

Usage: eval_insertions.py ref_fasta breakpoint_file insert_fasta [-q MINQUAL] [-nw PERCID]

- ref_fasta: truth insertions, headers `>deletion_<i> : chr<c>_<pos>`
- breakpoint_file: MindTheGap `.breakpoints` (headers `>bkpt<i>_chr<c>_pos_<p>_...`)
- insert_fasta: MindTheGap `.insertions.fasta` (same header prefix, optional
  `qual_<q>` field; missing qual counts as 66)

A breakpoint/insertion is matched to a truth site when its position is
within +-5 on the same chromosome; an assembled insertion counts as a true
positive when its banded-free percent identity (1 - editdistance/max(len))
exceeds `-nw` (default 90). Writes log_true / log_err like the reference and
prints the same five summary lines.
"""

import argparse
import re
import sys

import numpy as np


def edit_distance(a: str, b: str) -> int:
    """Unit-cost global edit distance (reference compare_WN with full band)."""
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    av = np.frombuffer(a.encode(), np.uint8)
    bv = np.frombuffer(b.encode(), np.uint8)
    prev = np.arange(m + 1, dtype=np.int32)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, np.int32)
        cur[0] = i
        sub = prev[:-1] + (av[i - 1] != bv)
        dele = prev[1:] + 1
        best = np.minimum(sub, dele)
        # insertion term needs a running min: prefix scan
        acc = cur[0]
        for j in range(1, m + 1):
            acc = min(best[j - 1], acc + 1)
            cur[j] = acc
        prev = cur
    return int(prev[m])


def read_fasta(path):
    """Yields (header, seq) with seq letters only (reference parse)."""
    header, seq = None, []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if header is not None:
                    yield header, "".join(seq)
                header, seq = line, []
            else:
                seq.append("".join(c for c in line if c.isalpha()))
    if header is not None:
        yield header, "".join(seq)


_TRUTH = re.compile(r">deletion_(\d+) : chr(\d+)_(\d+)")
_BKPT = re.compile(r">bkpt(\d+)_chr(\d+)_pos_(\d+)")
_QUAL = re.compile(r"qual_(\d+)")


def main():
    parser = argparse.ArgumentParser(prog="eval_insertions")
    parser.add_argument("ref_fasta")
    parser.add_argument("breakpoint_file")
    parser.add_argument("insert_fasta")
    parser.add_argument("-q", dest="min_qual", type=int, default=0)
    parser.add_argument("-nw", dest="nw", type=int, default=90)
    args = parser.parse_args()
    nw_pass = args.nw / 100.0
    print("min qual %i " % args.min_qual)

    ll = 5  # position tolerance, reference eval.cpp

    # truth: pos -> (cid, seq)
    rmap = {}
    for header, seq in read_fasta(args.ref_fasta):
        m = _TRUTH.search(header)
        if not m:
            continue
        pos, cid = int(m.group(3)), int(m.group(2))
        if pos in rmap:
            print("-----two insert at same pos (maybe diff chrom), "
                  "contact dev about this, not yet supported in this eval script-----")
        rmap[pos] = (cid, seq)

    # assembled insertions: pos -> [(cid, qual, seq, truei)]
    imap = {}
    for header, seq in read_fasta(args.insert_fasta):
        m = _BKPT.search(header)
        if not m:
            continue
        q = _QUAL.search(header)
        qual = int(q.group(1)) if q else 66
        imap.setdefault(int(m.group(3)), []).append(
            {"cid": int(m.group(2)), "qual": qual, "seq": seq, "truei": False})

    # breakpoints: pos -> {cid, truei}
    bmap = {}
    with open(args.breakpoint_file) as fh:
        for line in fh:
            m = _BKPT.search(line)
            if m:
                pos, cid = int(m.group(3)), int(m.group(2))
                if pos in bmap and bmap[pos]["cid"] != cid:
                    print("-----two bkpt at same pos (with diff chrom), "
                          "contact dev about this, not yet supported in this eval script-----")
                bmap[pos] = {"cid": cid, "truei": False}

    log_err = open("log_err", "w")
    log_true = open("log_true", "w")

    # find recall
    true_bkpt = 0
    for tpos, (r_cid, _) in rmap.items():
        for ii in range(-ll, ll + 1):
            b = bmap.get(tpos + ii)
            if b is not None and b["cid"] == r_cid:
                b["truei"] = True
                true_bkpt += 1
    nb_true_bkpt = sum(1 for b in bmap.values() if b["truei"])

    # fill recall
    tp = good_pos = nb_insert = 0
    for tpos, (r_cid, refseq) in rmap.items():
        found = found_good_pos = False
        vec = None
        for ii in range(-ll, ll + 1):
            vec = imap.get(tpos + ii)
            if vec is None:
                continue
            for jj, ins in enumerate(vec):
                if ins["qual"] < args.min_qual:
                    continue
                nberrs = edit_distance(refseq, ins["seq"])
                pid = 1.0 - nberrs / max(len(refseq), len(ins["seq"]))
                if ins["cid"] == r_cid and not found_good_pos:
                    good_pos += 1
                    found_good_pos = True
                if ins["cid"] == r_cid and pid > nw_pass:
                    tp += 1
                    found = True
                    ins["truei"] = True
                    log_true.write("%s\n%s\npid %f  ( %d %d ) nbdiff %d  pos %d  %d/%d \n"
                                   % (refseq, ins["seq"], pid, len(refseq), len(ins["seq"]),
                                      nberrs, ins["cid"], jj + 1, len(vec)))
                    break
            if found:
                break
        if found_good_pos and not found and vec is not None:
            log_err.write("----------- Good pos seq diff-------------\n%s\n"
                          "------------------------------------------\n" % refseq)
            for jj, ins in enumerate(vec):
                nberrs = edit_distance(refseq, ins["seq"])
                pid = 1.0 - nberrs / max(len(refseq), len(ins["seq"]))
                log_err.write("%s\npid %f  ( %d %d ) nbdiff %d  pos %d  %d/%d \n"
                              "--------------------------------------------\n"
                              % (ins["seq"], pid, len(refseq), len(ins["seq"]),
                                 nberrs, ins["cid"], jj + 1, len(vec)))
        if not found and not found_good_pos:
            log_err.write("----------- Not found-------------\n%s\n"
                          "----------------------------------\n" % refseq)
        nb_insert += 1

    # fill precision
    nb_insert_filled = nb_true_insert = 0
    for vec in imap.values():
        skip = False
        for ins in vec:
            if ins["qual"] < args.min_qual:
                skip = True
                break
            if ins["truei"]:
                nb_true_insert += 1
                break
        if not skip:
            nb_insert_filled += 1

    print("Find recall         %i / %i  : %.3f" % (true_bkpt, len(rmap),
          true_bkpt / len(rmap) if rmap else 0))
    print("Find prec           %i / %i  : %.3f" % (nb_true_bkpt, len(bmap),
          nb_true_bkpt / len(bmap) if bmap else 0))
    print("Fill good loc       %i / %i  : %.3f " % (good_pos, nb_insert,
          good_pos / nb_insert if nb_insert else 0))
    print("Recall (> %.2f)     %i / %i  : %.3f " % (nw_pass, tp, nb_insert,
          tp / nb_insert if nb_insert else 0))
    print("Fill prec           %i / %i  : %.3f " % (nb_true_insert, nb_insert_filled,
          nb_true_insert / nb_insert_filled if nb_insert_filled else 0))
    log_err.close()
    log_true.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
