#!/usr/bin/env python3
"""vde — variant-distance evaluator.

Derived from the reference's auxiliary evaluation script (/root/reference/
test/vde.py, python2): condensed python3 adaptation with the same scoring
semantics — noted per code-review guidance; aux tooling, not product code.

Scores an experiment variant set against a truth set with a position
tolerance (delta), per variant type. Input formats:

- eva: csv lines `position,type,comment`
- breakpoints: a MindTheGap `.breakpoints` FASTA whose headers follow
  `>left_contig_<n>_<comment>_pos_<p>_..._<TYPE>` (the simulator suite's
  header convention; TYPE in HOM/HET/SNP/MSNP/DEL/BACKUP)

Output: csv `type,TP,FP,recall,precision` per variant type.
"""

import argparse
import csv
import os
import re
import sys
from collections import defaultdict


class Variant:
    __slots__ = ("type", "comment")

    def __init__(self, vtype, comment):
        self.type = vtype
        self.comment = comment

    def __eq__(self, other):
        return self.type == other.type and self.comment == other.comment

    def __hash__(self):
        return hash(self.type + self.comment)


def eva2eva(filename):
    assert os.path.isfile(filename), "Error when I try open " + filename
    data = defaultdict(list)
    count = defaultdict(int)
    with open(filename) as csvfile:
        for val in csv.reader(csvfile):
            if not val:
                continue
            data[int(val[0])].append(Variant(val[1], val[2]))
            count[val[1]] += 1
    return data, count


_MTG2EVA = {"HOM": "homo", "HET": "hete", "SNP": "snp", "MSNP": "multi_snp",
            "DEL": "deletion", "BACKUP": "backup"}
_FINDPOS = re.compile(r"pos_([-\d]+)")
_FINDTYPE = re.compile(r"_([a-zA-Z]+)$")
_FINDCOMMENT = re.compile(r"contig_\d+_(.+)_pos")


def breakpoints2eva(filename):
    assert os.path.isfile(filename), "Error when I try open " + filename
    data = defaultdict(list)
    count = defaultdict(int)
    with open(filename) as fh:
        for line in fh:
            line = line.strip()
            if not line.startswith(">left_contig_"):
                continue
            vtype = _MTG2EVA[_FINDTYPE.search(line).group(1)]
            data[int(_FINDPOS.search(line).group(1))].append(
                Variant(vtype, _FINDCOMMENT.search(line).group(1))
            )
            count[vtype] += 1
    return data, count


def compare(exp, truth, delta):
    result = defaultdict(lambda: defaultdict(int))
    exact = set(exp) & set(truth)
    for pos in exact:
        for variant in exp[pos]:
            key = "TP" if variant in truth[pos] else "FP"
            result[variant.type][key] += 1

    not_found = set(exp) - exact
    for fuzzy_pos in sorted(set(exp) - exact):
        end = False
        for pos in range(fuzzy_pos - delta, fuzzy_pos + delta + 1):
            for variant in exp[fuzzy_pos]:
                # SNP positions must be exact (reference vde.py behavior)
                if variant.type in ("snp", "multi_snp"):
                    result[variant.type]["FP"] += 1
                    not_found.discard(fuzzy_pos)
                    end = True
                    break
                if variant in truth.get(pos, ()):
                    result[variant.type]["TP"] += 1
                    not_found.discard(fuzzy_pos)
                    end = True
                    break
            if end:
                break
    for pos in not_found:
        for variant in set(exp[pos]):
            result[variant.type]["FP"] += 1
    return result


def main():
    formats = {"eva": eva2eva, "breakpoints": breakpoints2eva}
    parser = argparse.ArgumentParser(
        prog="vde", formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("-e", "--experiment", required=True)
    parser.add_argument("-t", "--truth", required=True)
    parser.add_argument("-d", "--delta", type=int, default=5,
                        help="Acceptable diff between truth and experiment.")
    parser.add_argument("-ef", "--experiment-format", choices=sorted(formats), default="eva")
    parser.add_argument("-tf", "--truth-format", choices=sorted(formats), default="eva")
    args = parser.parse_args()

    experiment, _ = formats[args.experiment_format](args.experiment)
    truth, count = formats[args.truth_format](args.truth)
    result = compare(experiment, truth, args.delta)

    print(",".join(("type", "TP", "FP", "recall", "precision")))
    for gap in result:
        total = result[gap]["TP"] + result[gap]["FP"]
        prec = 1 if total == 0 else result[gap]["TP"] / total
        recall = 1 if count[gap] == 0 else result[gap]["TP"] / count[gap]
        print(",".join((gap, str(result[gap]["TP"]), str(result[gap]["FP"]),
                        str(recall), str(prec))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
