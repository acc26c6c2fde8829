"""ccsmeth-tpu CLI: 8 subcommands mirroring the reference's flag surface
(/root/reference/ccsmeth/ccsmeth.py:68-755) for drop-in compatibility:
call_hifi, call_mods, align_hifi, call_freqt, call_freqb, extract, train, trainm.

trainm is the same mesh training loop as train (the engine scales by sharding the
batch over all visible devices; multi-host adds --dist_coordinator/--num_processes).
"""

from __future__ import annotations

import argparse
import os
import sys

from ._version import __version__
from .utils.process import display_args, str2bool


def _add_extraction_args(p, call_mods=False):
    g = p.add_argument_group("EXTRACTION")
    g.add_argument("--mode", type=str, default="denovo", choices=["denovo", "align"],
                   help="denovo: without reference position info; align: with. "
                        "default denovo")
    g.add_argument("--holeids_e", type=str, default=None,
                   help="file contains holeids to be extracted, default None")
    g.add_argument("--holeids_ne", type=str, default=None,
                   help="file contains holeids not to be extracted, default None")
    if not call_mods:
        g.add_argument("--seq_len", type=int, default=21, help="len of kmer. default 21")
    g.add_argument("--motifs", type=str, default="CG",
                   help="motif seq to be extracted, default CG; comma-separated, IUPAC ok")
    g.add_argument("--mod_loc", type=int, default=0,
                   help="0-based location of the targeted base in the motif, default 0")
    g.add_argument("--methy_label", type=int, choices=[1, 0], default=1,
                   help="label of the interested modified bases (training), default 1")
    g.add_argument("--norm", type=str, default="zscore",
                   choices=["zscore", "min-mean", "min-max", "mad", "none"],
                   help="normalization method for ipd/pw, default zscore")
    g.add_argument("--no_decode", action="store_true", default=False,
                   help="do not use CodecV1 to decode ipd/pw")
    g.add_argument("--holes_batch", type=int, default=50,
                   help="number of reads per batch, default 50")
    if not call_mods:
        g.add_argument("--is_sn", type=str, default="no",
                       help="if extracting signal-to-noise features, yes or no, default no")
        g.add_argument("--is_map", type=str, default="no",
                       help="if extracting mapping features, yes or no, default no")
    ga = p.add_argument_group("EXTRACTION ALIGN_MODE")
    ga.add_argument("--ref", type=str, default=None,
                    help="path to genome reference (fasta), required in align mode")
    ga.add_argument("--mapq", type=int, default=1, help="MAPQ cutoff, default 1")
    ga.add_argument("--identity", type=float, default=0.0,
                    help="identity cutoff [0.0-1.0], default 0.0")
    ga.add_argument("--no_supplementary", action="store_true", default=False,
                    help="not use supplementary alignment")
    ga.add_argument("--skip_unmapped", type=str, default="yes",
                    help="if skipping unmapped sites in reads, yes or no, default yes")
    # drop-in compatibility with the reference CLI (ccsmeth.py): accepted and
    # ignored — BAM sort/index is first-party here, no samtools needed
    p.add_argument("--path_to_samtools", type=str, default=None,
                   help=argparse.SUPPRESS)


def _add_model_args(p, train=False):
    g = p.add_argument_group("MODEL_HYPER")
    g.add_argument("--model_type", type=str, default="attbigru2s",
                   choices=["attbilstm2s", "attbigru2s", "transencoder2s",
                            "attbilstm2s2", "attbigru2s2"],
                   help="model type, default attbigru2s")
    if train:
        g.add_argument("--seq_len", type=int, default=21, help="len of kmer, default 21")
    else:
        g.add_argument("--seq_len", type=int, default=21, help="len of kmer, default 21")
    g.add_argument("--is_npass", type=str, default="yes",
                   help="if using num_pass features, yes or no, default yes")
    g.add_argument("--is_stds", type=str, default="no",
                   help="if using std features, yes or no, default no")
    g.add_argument("--is_sn", type=str, default="no",
                   help="if using signal-to-noise features, yes or no, default no")
    g.add_argument("--is_map", type=str, default="no",
                   help="if using mapping features, yes or no, default no")
    g.add_argument("--class_num", type=int, default=2)
    g.add_argument("--dropout_rate", type=float, default=0.5 if train else 0)
    gr = p.add_argument_group("MODEL_HYPER RNN")
    gr.add_argument("--layer_rnn", type=int, default=3, help="BiRNN layer num, default 3")
    gr.add_argument("--hid_rnn", type=int, default=256, help="BiRNN hidden size, default 256")
    gt = p.add_argument_group("MODEL_HYPER TRANSFORMER")
    gt.add_argument("--layer_trans", type=int, default=6)
    gt.add_argument("--nhead", type=int, default=4)
    gt.add_argument("--d_model", type=int, default=256)
    gt.add_argument("--dim_ff", type=int, default=512)


# --- subcommand mains ------------------------------------------------------------------


def main_call_hifi(args):
    from .wrappers.call_hifi import CallHifiConfig, ccs_call_hifi_reads

    display_args(args)
    ccs_call_hifi_reads(CallHifiConfig(
        subreads=args.subreads, output=args.output, path_to_ccs=args.path_to_ccs,
        threads=args.threads, min_passes=args.min_passes, by_strand=args.by_strand,
        hd_finder=args.hd_finder, log_level=args.log_level,
        path_to_samtools=args.path_to_samtools))


def main_align_hifi(args):
    from .wrappers.align_hifi import AlignHifiConfig, align_hifi_reads_to_genome

    display_args(args)
    align_hifi_reads_to_genome(AlignHifiConfig(
        hifireads=args.hifireads, ref=args.ref, output=args.output,
        path_to_pbmm2=args.path_to_pbmm2, minimap2=args.minimap2,
        path_to_minimap2=args.path_to_minimap2, bestn=args.bestn, bwa=args.bwa,
        path_to_bwa=args.path_to_bwa, path_to_samtools=args.path_to_samtools,
        threads=args.threads))


def main_call_mods(args):
    from .pipeline.call_mods import CallModsConfig, call_mods_bam, call_mods_txt

    display_args(args)
    cfg = CallModsConfig(
        model_file=args.model_file, model_type=args.model_type, seq_len=args.seq_len,
        is_npass=str2bool(args.is_npass), is_stds=str2bool(args.is_stds),
        is_sn=str2bool(args.is_sn), is_map=str2bool(args.is_map),
        class_num=args.class_num, dropout_rate=args.dropout_rate,
        batch_size=args.batch_size, layer_rnn=args.layer_rnn, hid_rnn=args.hid_rnn,
        layer_trans=args.layer_trans, nhead=args.nhead, d_model=args.d_model,
        dim_ff=args.dim_ff, holes_batch=args.holes_batch, keep_pulse=args.keep_pulse,
        no_sort=args.no_sort, threads=args.threads, mode=args.mode, ref=args.ref,
        motifs=args.motifs, mod_loc=args.mod_loc, methy_label=args.methy_label,
        norm=args.norm, no_decode=args.no_decode, mapq=args.mapq,
        identity=args.identity, no_supplementary=args.no_supplementary,
        skip_unmapped=str2bool(args.skip_unmapped), holeids_e=args.holeids_e,
        holeids_ne=args.holeids_ne, gzip_out=args.gzip,
        rnn_backend=args.rnn_backend, precision=args.precision,
        dispatch_fuse=args.dispatch_fuse, sort_mem_mb=args.sort_mem_mb,
        transfer_quant=args.transfer_quant, fetch_quant=args.fetch_quant,
        profile_dir=args.profile_dir, h0_mode=args.h0_mode, tseed=args.tseed,
        num_processes=args.num_processes, process_id=args.process_id)
    if args.input.endswith(".bam") or args.input.endswith(".sam"):
        if args.seq_len % 2 == 0:
            raise ValueError("--seq_len must be odd")
        call_mods_bam(cfg, args.input, args.output)
    else:
        call_mods_txt(cfg, args.input, args.output)


def main_extract(args):
    from .pipeline.extract import extract_hifireads_features

    display_args(args)
    extract_hifireads_features(args)


def main_call_freqt(args):
    from .pipeline.call_freq_txt import FreqTxtConfig, call_mods_frequency_to_file

    display_args(args)
    call_mods_frequency_to_file(FreqTxtConfig(
        input_path=args.input_path, result_file=args.result_file,
        file_uid=args.file_uid, contigs=args.contigs, threads=args.threads,
        bed=args.bed, sort=args.sort, prob_cf=args.prob_cf,
        rm_1strand=args.rm_1strand, gzip=args.gzip,
        refsites_only=args.refsites_only, motifs=args.motifs, mod_loc=args.mod_loc,
        ref=args.ref))


def main_call_freqb(args):
    from .pipeline.call_freq_bam import (FreqBamConfig,
                                         call_mods_frequency_from_bamfile)

    display_args(args)
    call_mods_frequency_from_bamfile(FreqBamConfig(
        input_bam=args.input_bam, ref=args.ref, output=args.output,
        contigs=args.contigs, chunk_len=args.chunk_len, modtype=args.modtype,
        call_mode=args.call_mode, prob_cf=args.prob_cf, no_amb_cov=args.no_amb_cov,
        hap_tag=args.hap_tag, mapq=args.mapq, identity=args.identity,
        no_supplementary=args.no_supplementary, motifs=args.motifs,
        mod_loc=args.mod_loc, no_comb=args.no_comb,
        refsites_only=args.refsites_only, refsites_all=args.refsites_all,
        no_hap=args.no_hap, base_clip=args.base_clip, aggre_model=args.aggre_model,
        model_type=args.model_type, seq_len=args.seq_len, class_num=args.class_num,
        layer_rnn=args.layer_rnn, hid_rnn=args.hid_rnn, bin_size=args.bin_size,
        cov_cf=args.cov_cf, only_close=args.only_close, discrete=args.discrete,
        tseed=args.tseed, bed=args.bed, sort=args.sort, gzip=args.gzip,
        threads=args.threads, num_processes=args.num_processes,
        process_id=args.process_id,
        dist_coordinator=getattr(args, "dist_coordinator", None)))


def _train_cfg(args):
    from .training import TrainConfig

    return TrainConfig(
        train_file=args.train_file, valid_file=args.valid_file,
        model_dir=args.model_dir, model_type=args.model_type, seq_len=args.seq_len,
        is_npass=str2bool(args.is_npass), is_sn=str2bool(args.is_sn),
        is_map=str2bool(args.is_map), is_stds=str2bool(args.is_stds),
        class_num=args.class_num, dropout_rate=args.dropout_rate,
        layer_rnn=args.layer_rnn, hid_rnn=args.hid_rnn,
        layer_trans=args.layer_trans, nhead=args.nhead, d_model=args.d_model,
        dim_ff=args.dim_ff, optim_type=args.optim_type, batch_size=args.batch_size,
        lr_scheduler=args.lr_scheduler, lr=args.lr, lr_decay=args.lr_decay,
        lr_decay_step=args.lr_decay_step, lr_patience=args.lr_patience,
        lr_mode_strategy=args.lr_mode_strategy, max_epoch_num=args.max_epoch_num,
        min_epoch_num=args.min_epoch_num, pos_weight=args.pos_weight,
        step_interval=args.step_interval, init_model=args.init_model,
        step_fuse=args.step_fuse, dl_offsets=args.dl_offsets,
        train_transfer=args.train_transfer,
        save_opt_state=args.save_opt_state, resume_from=args.resume_from,
        rnn_backend=args.rnn_backend, precision=args.precision,
        tseed=args.tseed,
        dist_coordinator=getattr(args, "dist_coordinator", None),
        num_processes=getattr(args, "num_processes", 1),
        process_id=getattr(args, "process_id", 0))


def main_train(args):
    from .training import train

    display_args(args)
    train(_train_cfg(args))


def main_trainm(args):
    from .training import train

    display_args(args)
    train(_train_cfg(args))


# --- parser ----------------------------------------------------------------------------


def _add_train_args(p):
    gi = p.add_argument_group("INPUT")
    gi.add_argument("--train_file", type=str, required=True)
    gi.add_argument("--valid_file", type=str, required=True)
    go = p.add_argument_group("OUTPUT")
    go.add_argument("--model_dir", type=str, required=True)
    _add_model_args(p, train=True)
    g = p.add_argument_group("TRAINING")
    g.add_argument("--optim_type", type=str, default="Adam",
                   choices=["Adam", "RMSprop", "SGD", "Ranger", "LookaheadAdam"])
    g.add_argument("--batch_size", type=int, default=512)
    g.add_argument("--lr_scheduler", type=str, default="StepLR",
                   choices=["StepLR", "ReduceLROnPlateau"])
    g.add_argument("--lr", type=float, default=0.001)
    g.add_argument("--lr_decay", type=float, default=0.1)
    g.add_argument("--lr_decay_step", type=int, default=1)
    g.add_argument("--lr_patience", type=int, default=0)
    g.add_argument("--lr_mode_strategy", type=str, default="last",
                   choices=["last", "mean", "max"])
    g.add_argument("--max_epoch_num", type=int, default=50)
    g.add_argument("--min_epoch_num", type=int, default=10)
    g.add_argument("--pos_weight", type=float, default=1.0)
    g.add_argument("--step_interval", type=int, default=500)
    g.add_argument("--step_fuse", type=int, default=8,
                   help="fuse k train steps into one transfer + one device "
                        "dispatch between logging boundaries (lax.scan; "
                        "per-step numerics unchanged); 1 = per-step dispatch")
    g.add_argument("--dl_num_workers", type=int, default=0,
                   help="[IGNORED] data loading is vectorized in-process")
    g.add_argument("--dl_offsets", action="store_true", default=False,
                   help="stream training data out-of-core (chunked windowed "
                        "shuffle) instead of loading it all in RAM — for "
                        "feature files larger than memory")
    g.add_argument("--init_model", type=str, default=None)
    g.add_argument("--rnn_backend", type=str, default="xla",
                   choices=["xla", "pallas"],
                   help="BiGRU backend: xla scan or fused Pallas kernels with "
                        "custom VJP (GRU models), default xla")
    g.add_argument("--precision", type=str, default="fp32",
                   choices=["fp32", "bf16"])
    g.add_argument("--train_transfer", type=str, default="fp32",
                   choices=["fp32", "bf16", "packed"],
                   help="wire format of the packed train batch: bf16 halves "
                        "the per-step host->device transfer (features round "
                        "to ~3 decimal digits; labels/mask stay exact); "
                        "packed ships quantized byte rows (~11x smaller than "
                        "fp32 — kmer/npass/labels/mask exact, kinetics "
                        "round to 1/32)")
    g.add_argument("--use_compile", type=str, default="no",
                   help="[IGNORED] everything is jit-compiled; reference-CLI "
                        "compatibility (torch.compile toggle)")
    g.add_argument("--save_opt_state", action="store_true", default=False,
                   help="persist optimizer state + epoch next to each checkpoint")
    g.add_argument("--resume_from", type=str, default=None,
                   help="params .ckpt.npz to resume from (restores optimizer "
                        "state + epoch when its .train_state.npz exists)")
    g.add_argument("--tseed", type=int, default=1234)


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="ccsmeth-tpu",
        description="detecting DNA methylation from PacBio CCS reads — "
                    "TPU-native engine (capability-compatible with ccsmeth {})".format(
                        "0.5.0"),
    )
    parser.add_argument("-v", "--version", action="version",
                        version="ccsmeth-tpu {}".format(__version__))
    sub = parser.add_subparsers(dest="command", required=True)

    # call_hifi ---------------------------------------------------------------
    p = sub.add_parser("call_hifi", help="generate hifi reads with kinetics from "
                                         "subreads.bam using CCS")
    p.add_argument("--subreads", "-i", type=str, required=True,
                   help="path to subreads.bam file as input")
    p.add_argument("--output", "-o", type=str, default=None,
                   help="output file path, bam/sam; default input_prefix.hifi.bam")
    p.add_argument("--path_to_ccs", type=str, default=None)
    p.add_argument("--threads", "-t", type=int, default=None)
    p.add_argument("--min-passes", dest="min_passes", type=int, default=None)
    p.add_argument("--by-strand", dest="by_strand", action="store_true", default=False)
    p.add_argument("--hd-finder", dest="hd_finder", action="store_true", default=False)
    p.add_argument("--log-level", dest="log_level", type=str, default="WARN")
    p.add_argument("--path_to_samtools", type=str, default=None)
    p.set_defaults(func=main_call_hifi)

    # call_mods ---------------------------------------------------------------
    p = sub.add_parser("call_mods", help="call modifications")
    gi = p.add_argument_group("INPUT")
    gi.add_argument("--input", "-i", type=str, required=True,
                    help="input file: bam/sam, or features.tsv from extract")
    go = p.add_argument_group("OUTPUT")
    go.add_argument("--output", "-o", type=str, required=True,
                    help="output prefix ([out].per_readsite.tsv / [out].modbam.bam)")
    go.add_argument("--gzip", action="store_true", default=False)
    go.add_argument("--keep_pulse", action="store_true", default=False)
    go.add_argument("--no_sort", action="store_true", default=False)
    gc = p.add_argument_group("CALL")
    gc.add_argument("--model_file", "-m", type=str, required=True,
                    help="trained model (.ckpt torch or .npz native)")
    _add_model_args(p)
    gc.add_argument("--batch_size", "-b", type=int, default=512)
    gc.add_argument("--rnn_backend", type=str, default="xla",
                    choices=["xla", "pallas"],
                    help="BiGRU backend: xla (fp32 reference parity) or pallas "
                         "(fused TPU kernel fast path), default xla")
    gc.add_argument("--use_compile", type=str, default="no",
                    help="[IGNORED] everything is jit-compiled; reference-CLI "
                         "compatibility (torch.compile toggle)")
    gc.add_argument("--precision", type=str, default="fp32",
                    choices=["fp32", "bf16"],
                    help="compute precision for the pallas fast path, default fp32")
    gc.add_argument("--sort_mem_mb", type=int, default=512,
                    help="memory budget for the output-modbam external merge "
                         "sort; sorted runs spill to disk beyond this "
                         "(samtools sort -m equivalent), default 512")
    gc.add_argument("--dispatch_fuse", type=int, default=8,
                    help="fuse this many fixed-shape batches into one device "
                         "call (one transfer+dispatch+fetch RPC per group; "
                         "1 disables), default 8")
    gc.add_argument("--transfer_quant", type=str, default="auto",
                    choices=["auto", "none", "int8"],
                    help="int8-quantize IPD/PW means for host->device transfer "
                         "(218->134 B/site; zscore/mad norms; measured prob "
                         "drift 0.07 ML bytes). auto = int8 on the bf16 fast "
                         "path, none on the fp32 parity path")
    gc.add_argument("--fetch_quant", type=str, default="auto",
                    choices=["auto", "u8", "none"],
                    help="modbam-path result fetch: u8 fetches on-device "
                         "floor(p*256) ML bytes (1 B/site vs two bf16 probs; "
                         "≤1 ML-byte drift). auto = u8 on the bf16 fast path, "
                         "exact probs on the fp32 parity path")
    gc.add_argument("--profile_dir", type=str, default=None,
                    help="write a jax.profiler device trace here (xprof viewable)")
    gc.add_argument("--h0_mode", type=str, default="zeros",
                    choices=["zeros", "randn"],
                    help="RNN initial state: zeros (deterministic engine default) "
                         "or randn (replays the reference's per-forward randn h0 "
                         "draws seeded by --tseed for bit-reproduction of a "
                         "reference eval; requires --rnn_backend xla)")
    gs = p.add_argument_group("SCALE-OUT")
    gs.add_argument("--num_processes", type=int, default=1,
                    help="share-nothing scale-out: total processes splitting the "
                         "read stream by stable qname hash; run one call_mods "
                         "per process with a distinct -o, then merge modbams")
    gs.add_argument("--process_id", type=int, default=0,
                    help="this process's rank in [0, num_processes)")
    _add_extraction_args(p, call_mods=True)
    p.add_argument("--threads", "-p", type=int, default=10)
    p.add_argument("--threads_call", type=int, default=3,
                   help="[compat] model-worker count; the engine uses one jitted "
                        "device step, so this is advisory only")
    p.add_argument("--tseed", type=int, default=1234)
    p.set_defaults(func=main_call_mods)

    # align_hifi --------------------------------------------------------------
    p = sub.add_parser("align_hifi", help="align hifi reads to genome")
    p.add_argument("--hifireads", "-i", type=str, required=True)
    p.add_argument("--ref", type=str, required=True)
    p.add_argument("--output", "-o", type=str, default=None)
    p.add_argument("--header", action="store_true", default=False)
    p.add_argument("--path_to_pbmm2", type=str, default=None)
    p.add_argument("--minimap2", action="store_true", default=False)
    p.add_argument("--path_to_minimap2", type=str, default=None)
    p.add_argument("--bestn", "-n", type=int, default=3)
    p.add_argument("--bwa", action="store_true", default=False)
    p.add_argument("--path_to_bwa", type=str, default=None)
    p.add_argument("--path_to_samtools", type=str, default=None)
    p.add_argument("--threads", "-t", type=int, default=5)
    p.set_defaults(func=main_align_hifi)

    # call_freqt --------------------------------------------------------------
    p = sub.add_parser("call_freqt", help="call frequency of modifications from "
                                          "per_readsite text files")
    p.add_argument("--input_path", "-i", action="append", type=str, required=True)
    p.add_argument("--file_uid", type=str, default=None)
    p.add_argument("--result_file", "-o", type=str, required=True)
    p.add_argument("--contigs", type=str, default=None)
    p.add_argument("--threads", type=int, default=1)
    p.add_argument("--bed", action="store_true", default=False)
    p.add_argument("--sort", action="store_true", default=False)
    p.add_argument("--prob_cf", type=float, default=0.0)
    p.add_argument("--rm_1strand", action="store_true", default=False)
    p.add_argument("--gzip", action="store_true", default=False)
    p.add_argument("--refsites_only", action="store_true", default=False)
    p.add_argument("--motifs", type=str, default="CG")
    p.add_argument("--mod_loc", type=int, default=0)
    p.add_argument("--ref", type=str, default=None)
    p.set_defaults(func=main_call_freqt)

    # call_freqb --------------------------------------------------------------
    p = sub.add_parser("call_freqb", help="call frequency of modifications from "
                                          "modbam files")
    p.add_argument("--threads", type=int, default=5)
    p.add_argument("--input_bam", "-i", type=str, required=True)
    p.add_argument("--ref", type=str, required=True)
    p.add_argument("--contigs", type=str, default=None)
    p.add_argument("--chunk_len", type=int, default=500000)
    p.add_argument("--output", "-o", type=str, required=True)
    p.add_argument("--bed", action="store_true", default=False)
    p.add_argument("--sort", action="store_true", default=False)
    p.add_argument("--gzip", action="store_true", default=False)
    p.add_argument("--modtype", type=str, default="5mC", choices=["5mC"])
    p.add_argument("--call_mode", type=str, default="count",
                   choices=["count", "aggregate"])
    p.add_argument("--prob_cf", type=float, default=0.0)
    p.add_argument("--no_amb_cov", action="store_true", default=False)
    p.add_argument("--hap_tag", type=str, default="HP")
    p.add_argument("--mapq", type=int, default=1)
    p.add_argument("--identity", type=float, default=0.0)
    p.add_argument("--no_supplementary", action="store_true", default=False)
    p.add_argument("--motifs", type=str, default="CG")
    p.add_argument("--mod_loc", type=int, default=0)
    p.add_argument("--no_comb", action="store_true", default=False)
    p.add_argument("--refsites_only", action="store_true", default=False)
    p.add_argument("--refsites_all", action="store_true", default=False)
    p.add_argument("--no_hap", action="store_true", default=False)
    p.add_argument("--base_clip", type=int, default=0)
    p.add_argument("--aggre_model", "-m", type=str, default=None)
    p.add_argument("--model_type", type=str, default="attbigru",
                   choices=["attbilstm", "attbigru"])
    p.add_argument("--seq_len", type=int, default=11)
    p.add_argument("--class_num", type=int, default=1)
    p.add_argument("--layer_rnn", type=int, default=1)
    p.add_argument("--hid_rnn", type=int, default=32)
    p.add_argument("--bin_size", type=int, default=20)
    p.add_argument("--cov_cf", type=int, default=4)
    p.add_argument("--only_close", action="store_true", default=False)
    p.add_argument("--discrete", action="store_true", default=False)
    p.add_argument("--tseed", type=int, default=1234)
    gp = p.add_argument_group("SCALE-OUT")
    gp.add_argument("--num_processes", type=int, default=1,
                    help="scale-out process count. Without --dist_coordinator: "
                         "share-nothing — each process owns a slice of the "
                         "genome chunk list; run one call_freqb per process "
                         "with a distinct -o, then concatenate/merge")
    gp.add_argument("--process_id", type=int, default=0,
                    help="this process's rank in [0, num_processes)")
    gp.add_argument("--dist_coordinator", type=str, default=None,
                    help="host:port for jax.distributed: processes form one "
                         "device mesh, split the read stream by qname hash, "
                         "psum-merge per-site counts over ICI/DCN, and rank 0 "
                         "writes the single merged output")
    p.set_defaults(func=main_call_freqb)

    # extract -----------------------------------------------------------------
    p = sub.add_parser("extract", help="extract features from hifi reads")
    p.add_argument("--input", "-i", type=str, required=True,
                   help="input file in bam/sam format")
    p.add_argument("--output", "-o", type=str, default=None,
                   help="output features file; default input_prefix.features.tsv")
    p.add_argument("--gzip", action="store_true", default=False)
    _add_extraction_args(p)
    p.add_argument("--threads", type=int, default=5)
    p.set_defaults(func=main_extract)

    # train -------------------------------------------------------------------
    p = sub.add_parser("train", help="train a model")
    _add_train_args(p)
    p.set_defaults(func=main_train)

    # trainm ------------------------------------------------------------------
    p = sub.add_parser("trainm", help="train a model across chips/hosts "
                                      "(same mesh loop as train)")
    _add_train_args(p)
    # trainm additionally accepts the single-strand families (reference
    # train_multigpu.py:142-152 + FeaData3ss)
    for a in p._actions:
        if a.dest == "model_type":
            a.choices = ["attbilstm2s", "attbigru2s", "transencoder2s",
                         "attbilstm2s2", "attbigru2s2", "attbigru1s",
                         "attbilstm1s"]
    g = p.add_argument_group("DISTRIBUTED")
    g.add_argument("--dist_coordinator", type=str, default=None,
                   help="coordinator address host:port for jax.distributed "
                        "(replaces --dist-url/--nodes of the reference)")
    g.add_argument("--num_processes", type=int, default=1,
                   help="total hosts (reference: --nodes * --ngpus_per_node)")
    g.add_argument("--process_id", type=int, default=0,
                   help="this host's rank (reference: --node_rank)")
    g.add_argument("--epoch_sync", action="store_true", default=False,
                   help="[compat] params are mesh-replicated every step; no-op")
    p.set_defaults(func=main_trainm)

    return parser


def main(argv=None) -> int:
    # Host-environment escape hatch: some deployments register an accelerator
    # plugin via sitecustomize that overrides JAX_PLATFORMS, so an env var the
    # CLI reads itself is the only reliable way to pin CPU execution (mirrors
    # the reference's use_cuda auto-fallback, constants_torch.py:5).
    if os.environ.get("CCS_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    parser = get_parser()
    args = parser.parse_args(argv)
    args.func(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
