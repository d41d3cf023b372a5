"""Command-line interface mirroring the reference's flags
(src/CommandLineParser.cpp:126-309).

    lordfast-tpu --index ref.fa
    lordfast-tpu --search ref.fa --seq reads.fq [options]
"""

from __future__ import annotations

import argparse
import sys

from .config import ChainAlg, LordfastConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lordfast-tpu",
        description="TPU-native long-read aligner (lordFAST capabilities)",
    )
    p.add_argument("--index", "-I", metavar="REF", help="build index for REF")
    p.add_argument("--search", "-S", metavar="REF", help="map reads against REF")
    p.add_argument("--seq", "-s", metavar="READS", help="FASTA/FASTQ(.gz) reads")
    p.add_argument("--out", "-o", default="", help="output SAM (default stdout)")
    p.add_argument("--threads", "-t", type=int, default=1)
    p.add_argument("--minAnchorLen", "-k", type=int, default=14)
    p.add_argument("--maxRefHit", "-m", type=int, default=1000)
    p.add_argument("--minReadLen", "-l", type=int, default=1000)
    p.add_argument("--anchorCount", "-c", type=int, default=1000)
    p.add_argument("--numMap", "-n", type=int, default=10)
    p.add_argument("--chainAlg", "-a", default="dp-n2")
    p.add_argument("--readGroup", "-R", default="")
    p.add_argument("--noSamHeader", action="store_true")
    p.add_argument("--chainReward", "-r", type=float, default=9.3)
    p.add_argument("--chainPenalty", "-p", type=float, default=11.4)
    p.add_argument("--gapPenalty", "-g", type=float, default=0.15)
    p.add_argument("--version", "-v", action="store_true")
    # ---- TPU-build additions (aux subsystems, SURVEY.md §5) ----
    p.add_argument("--resume", action="store_true",
                   help="resume an interrupted --search run at the last "
                        "completed chunk (requires --out)")
    p.add_argument("--verbose", "-d", type=int, default=0, metavar="N",
                   help="runtime verbosity 0-3 (reference VERBOSITY builds)")
    p.add_argument("--profile", default="", metavar="DIR",
                   help="write a jax.profiler trace of the mapping run")
    p.add_argument("--shardIndex", action="store_true",
                   help="stripe the FM-index over all devices with routed "
                        "lookups instead of replicating it (for indexes "
                        "too big for one chip's HBM; SURVEY.md §5.8)")
    # ---- multi-host (DCN) flags (parallel/multihost.py) ----
    p.add_argument("--numProcesses", type=int, default=1,
                   help="total mapping processes (hosts); this process "
                        "maps chunks with id %% numProcesses == "
                        "processIndex and writes <out>.part<i>")
    p.add_argument("--processIndex", type=int, default=-1,
                   help="this process's index (default: $LORDFAST_PROCESS_"
                        "INDEX or 0)")
    p.add_argument("--coordinator", default="",
                   help="host:port of the jax.distributed coordinator; "
                        "when set the processes form one distributed "
                        "runtime, barrier at end of mapping, and process "
                        "0 merges the shards")
    p.add_argument("--mergeShards", action="store_true",
                   help="merge <out>.part0..N-1 (from a --numProcesses "
                        "run) into <out> in input order and exit")
    p.add_argument("--chunkSize", type=int, default=0, metavar="BYTES",
                   help="read-chunk size (default 100 MB, the reference's "
                        "bound, src/baseFAST.cpp:59)")
    p.add_argument("--seeder", default="extend-whole",
                   choices=["extend-whole", "extend-whole-2",
                            "extend-whole-3"],
                   help="seeder variant: the reference's active "
                        "getLocs_extend_whole_step (default, device "
                        "kernel) or its two dormant in-tree variants "
                        "(src/BWT.cpp:423-591; host implementations)")
    p.add_argument("--exportBwa", action="store_true",
                   help="with --index: also write the reference-"
                        "compatible .bwt/.sa/.pac/.ann/.amb/.cache file "
                        "set next to REF (index/bwa_io.py)")
    return p


def parse_read_group(rg_line: str):
    """set_read_group (src/CommandLineParser.cpp:85-124)."""
    if not rg_line.startswith("@RG"):
        raise ValueError("SAM read group line does not start with @RG")
    if "\t" in rg_line:
        raise ValueError("read group line contained literal <tab> characters")
    out = []
    i = 0
    while i < len(rg_line):
        c = rg_line[i]
        if c == "\\" and i + 1 < len(rg_line):
            nxt = rg_line[i + 1]
            out.append({"t": "\t", "n": "\n", "r": "\r", "\\": "\\"}.get(nxt, ""))
            i += 2
        else:
            out.append(c)
            i += 1
    rg = "".join(out)
    pos = rg.find("ID:")
    if pos < 0:
        raise ValueError("no ID within the read group line")
    end = pos + 3
    while end < len(rg) and rg[end] not in "\t\n":
        end += 1
    return rg, rg[pos + 3 : end]


def config_from_args(args) -> LordfastConfig:
    chain_alg = args.chainAlg
    if chain_alg not in (ChainAlg.CLASP, ChainAlg.DPN2):
        print(
            "[WARNING] unknown argument for --chainAlg. "
            "Using dynamic programming (dp-n2)!",
            file=sys.stderr,
        )
        chain_alg = ChainAlg.DPN2
    rg, rg_id = ("", "")
    if args.readGroup:
        rg, rg_id = parse_read_group(args.readGroup)
    return LordfastConfig(
        min_anchor_len=args.minAnchorLen,
        max_ref_hits=args.maxRefHit,
        min_read_len=args.minReadLen,
        sampling_count=args.anchorCount,
        max_map=args.numMap,
        chain_alg=chain_alg,
        chain_reward=args.chainReward,
        chain_penalty=args.chainPenalty,
        gap_penalty=args.gapPenalty,
        read_group=rg,
        read_group_id=rg_id,
        no_sam_header=args.noSamHeader,
        num_threads=args.threads,
        verbosity=args.verbose,
        seeder=args.seeder,
        **({"chunk_bytes": args.chunkSize} if args.chunkSize > 0 else {}),
    ).validate()


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    args = build_parser().parse_args(argv)
    if args.version:
        from . import __version__

        print(f"lordfast-tpu {__version__}")
        return 0

    if args.mergeShards:
        if not args.out or args.numProcesses < 1:
            print("[ERROR] --mergeShards requires --out and --numProcesses",
                  file=sys.stderr)
            return 1
        from .parallel.multihost import merge_shards

        n = merge_shards(args.out, args.numProcesses)
        print(f"[NOTE] merged {n} chunks from {args.numProcesses} shards "
              f"into {args.out}", file=sys.stderr)
        return 0

    if bool(args.index) == bool(args.search):
        print("[ERROR] indexing / searching mode should be selected",
              file=sys.stderr)
        return 1

    cfg = config_from_args(args)

    if args.index:
        from .index.builder import build_index, index_path_for, save_index

        idx = build_index(args.index, cfg)
        save_index(idx, index_path_for(args.index))
        if args.exportBwa:
            from .index.bwa_io import save_bwa_index

            save_bwa_index(idx, args.index)
            print(f"[NOTE] wrote reference-compatible index files next to "
                  f"{args.index}", file=sys.stderr)
        return 0

    if not args.seq:
        print("[ERROR] please indicate a sequence file for searching",
              file=sys.stderr)
        return 1

    from .index.builder import (build_index, index_path_for, load_index,
                                save_index)
    from .pipeline.engine import MappingEngine

    ipath = index_path_for(args.search)
    try:
        idx = load_index(ipath)
    except FileNotFoundError:
        # fall back to a reference-built on-disk index (bwa files) before
        # rebuilding — mirrors bwt_load's reuse (src/BWT.cpp:189-242)
        from .index.bwa_io import bwa_files_present, load_bwa_index

        if bwa_files_present(args.search):
            print(f"[NOTE] loading reference-format index files for "
                  f"{args.search}", file=sys.stderr)
            idx = load_bwa_index(args.search, cfg)
        else:
            print(f"[WARNING] could not locate index file: {ipath}; "
                  f"building", file=sys.stderr)
            idx = build_index(args.search, cfg)
            save_index(idx, ipath)

    # ---- multi-host setup (parallel/multihost.py) ----
    import os as _os

    num_procs = max(1, args.numProcesses)
    proc_idx = (args.processIndex if args.processIndex >= 0
                else int(_os.environ.get("LORDFAST_PROCESS_INDEX", "0")))
    out_path = args.out
    if num_procs > 1:
        if not args.out:
            print("[ERROR] --numProcesses requires --out (per-host shard "
                  "files)", file=sys.stderr)
            return 1
        from .parallel.multihost import maybe_init_distributed, shard_path

        maybe_init_distributed(args.coordinator, num_procs, proc_idx)
        out_path = shard_path(args.out, proc_idx)

    if args.shardIndex:
        import jax

        from .parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices())
        # batch must divide evenly over the mesh
        if cfg.batch_reads % mesh.size:
            cfg = cfg.replace(
                batch_reads=-(-cfg.batch_reads // mesh.size) * mesh.size
            )
        engine = MappingEngine(idx, cfg, mesh=mesh, shard_index=True)
    else:
        engine = MappingEngine(idx, cfg)
    cmdline = "lordfast-tpu " + " ".join(argv)
    from .utils.checkpoint import ChunkProgress
    from .utils.metrics import profiler_trace

    progress = None
    mode = "w"
    prior_table = []
    if args.out and args.resume:
        progress = ChunkProgress(out_path, str(args.seq),
                                 process_index=proc_idx,
                                 chunk_bytes=cfg.chunk_bytes)
        if progress.load() >= 0:
            mode = "a"
            # a crash mid-chunk leaves partially flushed records for the
            # unfinished chunk; truncate back to the last durable offset
            # so the resumed chunk is not duplicated after a torn line
            try:
                import os

                if os.path.getsize(out_path) > progress.out_offset:
                    with open(out_path, "r+") as f:
                        f.truncate(progress.out_offset)
            except OSError:
                pass
            if num_procs > 1:
                # keep the durable part of the shard's chunk table
                from .parallel.multihost import chunks_path

                try:
                    import json

                    rec = json.loads(open(chunks_path(out_path)).read())
                    prior_table = [
                        tuple(c) for c in rec["chunks"]
                        if c[0] <= progress.last_done
                        and c[2] <= progress.out_offset
                    ]
                except (OSError, ValueError, KeyError):
                    prior_table = []
            print(
                f"[NOTE] resuming after chunk {progress.last_done}",
                file=sys.stderr,
            )
    elif args.resume:
        print("[WARNING] --resume requires --out; ignoring", file=sys.stderr)
    if args.out and progress is None:
        progress = ChunkProgress(out_path, str(args.seq),
                                 process_index=proc_idx,
                                 chunk_bytes=cfg.chunk_bytes)

    with profiler_trace(args.profile):
        if args.out:
            # buffered SAM writes, reference's opt_outputBufferSize
            # (2 MB default; src/CommandLineParser.cpp:40,
            # src/LordFAST.cpp:451-458)
            with open(out_path, mode,
                      buffering=max(cfg.output_buffer_size, 2)) as out:
                engine.map_file(args.seq, out, cmdline, progress=progress,
                                process_index=proc_idx,
                                num_processes=num_procs)
        else:
            engine.map_file(args.seq, sys.stdout, cmdline,
                            process_index=proc_idx,
                            num_processes=num_procs)

    if num_procs > 1:
        from .parallel.multihost import (barrier, merge_shards,
                                         write_chunk_table)

        write_chunk_table(out_path, prior_table + engine.chunk_table)
        # with a live distributed runtime, process 0 merges after the
        # cross-host barrier; otherwise run --mergeShards separately
        barrier("lordfast-map-done")
        if args.coordinator and proc_idx == 0:
            n = merge_shards(args.out, num_procs)
            print(f"[NOTE] merged {n} chunks into {args.out}",
                  file=sys.stderr)
        barrier("lordfast-merge-done")
    if cfg.verbosity >= 1:
        print("[metrics] " + engine.metrics.to_json(), file=sys.stderr)
    # cumulative across resumed runs (persisted in the progress sidecar)
    n_reads = engine.stats["reads"]
    n_mapped = engine.stats["mapped"]
    if progress is not None:
        n_reads = max(n_reads, progress.total_reads)
        n_mapped = max(n_mapped, progress.total_mapped)
    print(
        f"[NOTE] processed {n_reads} reads ({n_mapped} mapped)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
