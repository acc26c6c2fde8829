#!/usr/bin/env python
"""Read-level evaluation of call_mods per_readsite files: confusion matrix, AUC and
related stats over rounds of random site sampling.

Capability parity with /root/reference/scripts/eval_at_readlevel.py: inputs are two
per_readsite TSVs (known-unmethylated and known-methylated samples), filtered by
depth/prob cutoffs and optional sampleid lists, evaluated at several sample sizes.
"""

import argparse
import os
import random
from collections import namedtuple

import numpy as np
from sklearn.metrics import roc_auc_score

NUM_SITES = [1000, 10000, 100000, 1000000000]

CallRecord = namedtuple("CallRecord", [
    "chrom", "pos", "strand", "holeid", "loc", "depth", "prob0", "prob1",
    "predicted_label", "is_true_methylated"])


def get_sampleids(path):
    ids = set()
    with open(path) as rf:
        for line in rf:
            if not line.startswith("#"):
                ids.add(line.strip())
    return ids


def sample_sites_ont(filename, is_methylated, probcf, sampleids=None):
    """deepsignal-series per-read call file (reference eval_at_readlevel.py:76-101):
    no depth column; sampleid is the full first-6-column tuple, no dedup."""
    all_crs = []
    skip_cnt = cnt = 0
    with open(filename) as rf:
        for line in rf:
            cnt += 1
            words = line.strip().split("\t")
            sampid = "\t".join(words[:6])
            if sampleids is not None and sampid not in sampleids:
                skip_cnt += 1
                continue
            prob0, prob1 = float(words[6]), float(words[7])
            if abs(prob0 - prob1) < probcf:
                skip_cnt += 1
                continue
            all_crs.append(CallRecord(words[0], int(words[1]), words[2], "-", -1,
                                      -1, prob0, prob1, int(words[8]),
                                      is_methylated))
    print("there are {} cpg candidates totally, {} cpgs kept, {} cpgs left".format(
        cnt, len(all_crs), skip_cnt))
    random.shuffle(all_crs)
    return all_crs


def sample_sites(filename, is_methylated, depthcf, probcf, sampleids=None,
                 dstrand=False):
    all_crs = []
    skip_cnt = cnt = repeat_cnt = 0
    read_sampleids = set()
    with open(filename) as rf:
        for line in rf:
            cnt += 1
            words = line.strip().split("\t")
            holeid = words[3].split("/")[1] if "/" in words[3] else words[3]
            pos = int(words[1])
            if not dstrand and words[2] == "-":
                pos -= 1
            sampid = "\t".join([words[0], str(pos), holeid])
            if sampleids is not None:
                if not dstrand and sampid not in sampleids:
                    skip_cnt += 1
                    continue
                if dstrand:
                    sampid_fwd = "\t".join([words[0], str(pos - 1), holeid])
                    if sampid not in sampleids and sampid_fwd not in sampleids:
                        skip_cnt += 1
                        continue
            depth = words[5]
            if "," in depth:
                dw, dc = (float(x) for x in depth.split(","))
                if dw < depthcf or dc < depthcf:
                    skip_cnt += 1
                    continue
            elif float(depth) < depthcf:
                skip_cnt += 1
                continue
            prob0, prob1 = float(words[6]), float(words[7])
            if abs(prob0 - prob1) < probcf:
                skip_cnt += 1
                continue
            if sampid in read_sampleids:
                repeat_cnt += 1
                continue
            read_sampleids.add(sampid)
            all_crs.append(CallRecord(words[0], int(words[1]), words[2], words[3],
                                      int(words[4]), depth, prob0, prob1,
                                      int(words[8]), is_methylated))
    print("there are {} cpg candidates totally, {} cpgs kept, {} cpgs left, "
          "{} cpgs repeat".format(cnt, len(all_crs), skip_cnt, repeat_cnt))
    random.shuffle(all_crs)
    return all_crs


def evaluate_round(tested_sites):
    labels = np.array([s.is_true_methylated for s in tested_sites], dtype=bool)
    preds = np.array([s.predicted_label for s in tested_sites], dtype=bool)
    scores = np.array([s.prob1 for s in tested_sites])
    tp = int(np.sum(preds & labels))
    fp = int(np.sum(preds & ~labels))
    tn = int(np.sum(~preds & ~labels))
    fn = int(np.sum(~preds & labels))
    n = len(tested_sites)
    accuracy = (tp + tn) / n if n else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    specificity = tn / (tn + fp) if tn + fp else 0.0
    precision = tp / (tp + fp) if tp + fp else 0.0
    fall_out = fp / (fp + tn) if fp + tn else 0.0
    miss_rate = fn / (fn + tp) if fn + tp else 0.0
    fdr = fp / (fp + tp) if fp + tp else 0.0
    npv = tn / (tn + fn) if tn + fn else 0.0
    try:
        auroc = roc_auc_score(labels, scores)
    except ValueError:
        auroc = 0.0
    return (tp, fn, tn, fp, accuracy, recall, specificity, precision, fall_out,
            miss_rate, fdr, npv, auroc, auroc, n)


def main():
    parser = argparse.ArgumentParser(
        description="Calculate call accuracy stats of ccsmeth-tpu for cpgs")
    parser.add_argument("--unmethylated", type=str, required=True)
    parser.add_argument("--methylated", type=str, required=True)
    parser.add_argument("--depth_cf", action="append", required=True)
    parser.add_argument("--prob_cf", action="append", required=True)
    parser.add_argument("--round", type=int, default=5)
    parser.add_argument("--result_file", type=str, required=True)
    parser.add_argument("--sampleids_file_u", type=str, default=None)
    parser.add_argument("--sampleids_file_m", type=str, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--dstrand", action="store_true", default=False)
    parser.add_argument("--ont", action="store_true", default=False,
                        help="input is deepsignal-series per-read calls "
                             "(prob columns shifted by one)")
    args = parser.parse_args()

    random.seed(args.seed)
    ids_u = get_sampleids(args.sampleids_file_u) if args.sampleids_file_u else None
    ids_m = get_sampleids(args.sampleids_file_m) if args.sampleids_file_m else None

    with open(os.path.abspath(args.result_file), "w") as pw:
        pw.write("tested_type\tTP\tFN\tTN\tFP\taccuracy\trecall\tspecificity\t"
                 "precision\tfallout\tmiss_rate\tFDR\tNPV\tAUC\tAUC2\tsamplenum\t"
                 "depth_cutoff\tprob_cf\tnum_rounds\n")
        for depth_cf in args.depth_cf:
            for prob_cf in args.prob_cf:
                if args.ont:
                    um = sample_sites_ont(args.unmethylated, False,
                                          float(prob_cf), ids_u)
                    me = sample_sites_ont(args.methylated, True,
                                          float(prob_cf), ids_m)
                else:
                    um = sample_sites(args.unmethylated, False, int(depth_cf),
                                      float(prob_cf), ids_u, args.dstrand)
                    me = sample_sites(args.methylated, True, int(depth_cf),
                                      float(prob_cf), ids_m, args.dstrand)
                for site_num in NUM_SITES:
                    num_rounds = args.round
                    if site_num >= len(me) and site_num >= len(um):
                        num_rounds = 1
                    rows = []
                    for _ in range(num_rounds):
                        random.shuffle(me)
                        random.shuffle(um)
                        tested = me[:site_num] + um[:site_num]
                        if not tested:
                            continue
                        rows.append(evaluate_round(tested))
                    if not rows:
                        continue
                    arr = np.array(rows, dtype=float)
                    mean = arr.mean(axis=0)
                    pw.write("\t".join(
                        ["ccsmeth_tpu"]
                        + ["{:.0f}".format(x) for x in mean[:4]]
                        + ["{:.4f}".format(x) for x in mean[4:14]]
                        + ["{:.0f}".format(mean[14]), str(depth_cf), str(prob_cf),
                           str(num_rounds)]) + "\n")
    print("done: {}".format(args.result_file))


if __name__ == "__main__":
    main()
