"""Command-line interface: the skani CLI surface on the TPU engine.

Re-creates the four skani subcommands the reference crate ships (its
``cli`` feature is enabled by pyskani, reference Cargo.toml:34; modes
``Mode::{Sketch,Dist,Search,Triangle}`` per SURVEY.md §2 S1):

  skani-tpu sketch   -o DIR genome1.fa [genome2.fa ...]
  skani-tpu dist     -q query.fa [...] -r ref.fa [...]
  skani-tpu search   -d DIR query.fa [...]
  skani-tpu triangle genome1.fa genome2.fa [...]

Output is skani-style TSV:
  Ref_file  Query_file  ANI  Align_fraction_ref  Align_fraction_query
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List


def _add_sketch_params(p):
    p.add_argument("-c", "--compression", type=int, default=125,
                   help="compression factor (sketch density)")
    p.add_argument("-m", "--marker-compression", type=int, default=1000,
                   help="marker k-mer compression factor")
    p.add_argument("-k", type=int, default=15, help="k-mer size")


def _add_query_params(p):
    p.add_argument("--median", action="store_true",
                   help="estimate median instead of mean identity")
    p.add_argument("--robust", action="store_true",
                   help="10%%/90%% trimmed-mean identity")
    p.add_argument("-s", "--screen", type=float, default=None,
                   help="marker screening ANI cutoff (fraction or percent)")
    p.add_argument("--faster-small", action="store_true",
                   help="screen genomes with <20 markers aggressively")
    p.add_argument("--learned-ani", choices=["auto", "yes", "no"],
                   default="auto")
    p.add_argument("--min-af", type=float, default=15.0,
                   help="minimum aligned fraction (percent) to report")
    p.add_argument("--ci", action="store_true",
                   help="report [5%%, 95%%] percentile-bootstrap ANI "
                        "confidence intervals (extra output columns)")
    p.add_argument("-o", "--output-file", default=None,
                   help="write results to this file instead of stdout")
    p.add_argument("-n", "--max-results", type=int, default=1_000_000_000,
                   help="keep at most this many hits per query "
                        "(best ANI first)")


def _learned(val):
    return {"auto": None, "yes": True, "no": False}[val]


def _screen_val(s):
    if s is None:
        return None
    return s / 100.0 if s > 1.0 else s


def _header(out, ci=False):
    cols = "Ref_file\tQuery_file\tANI\tAlign_fraction_ref\t" \
           "Align_fraction_query"
    if ci:
        cols += "\tANI_5_percentile\tANI_95_percentile"
    out.write(cols + "\n")


def _emit(out, ref_name, query_name, ani, af_r, af_q, ci=None):
    row = (f"{ref_name}\t{query_name}\t{100*ani:.2f}\t"
           f"{100*af_r:.2f}\t{100*af_q:.2f}")
    if ci is not None:
        row += f"\t{100*ci[0]:.2f}\t{100*ci[1]:.2f}"
    out.write(row + "\n")


class _out_stream:
    """Context manager: ``-o FILE`` or stdout (skani's out_file_name)."""

    def __init__(self, path):
        self._path = path
        self._fh = None

    def __enter__(self):
        if self._path is None:
            return sys.stdout
        self._fh = open(self._path, "w")
        return self._fh

    def __exit__(self, *exc):
        if self._fh is not None:
            self._fh.close()
        return False


def _expand_lists(paths: List[str], list_files: List[str] | None) -> List[str]:
    """Positional paths plus newline-separated paths from -l list files
    (skani's file-of-filenames input convention)."""
    out = list(paths)
    for lf in list_files or ():
        with open(lf) as f:
            out.extend(line.strip() for line in f
                       if line.strip() and not line.startswith("#"))
    return out


def _genome_records(paths: List[str]):
    """Yield (name, contigs) per FASTA file (whole file = one genome).

    Uses the native reader (native/fasta_reader.cpp) when built, falling
    back to the pure-Python parser.
    """
    from .io.native import read_genome_native
    from .io.fasta import parse
    for path in paths:
        native = read_genome_native(path)
        if native is not None:
            seq, starts, _names = native
            contigs = [seq[starts[i]:starts[i + 1]].tobytes()
                       for i in range(len(starts) - 1)]
        else:
            contigs = [rec.seq for rec in parse(path)]
        yield os.path.basename(path), contigs


def cmd_sketch(args) -> int:
    from .database import Database
    genomes = _expand_lists(args.genomes, args.list_files)
    if not genomes:
        print("error: no input genomes (positional or -l)", file=sys.stderr)
        return 2
    with Database(args.output, compression=args.compression,
                  marker_compression=args.marker_compression,
                  k=args.k) as db:
        db.sketch_many(_genome_records(genomes))
        print(f"sketched {len(genomes)} genomes", file=sys.stderr)
    return 0


def _run_queries(db, args, out) -> None:
    """Query each input genome and emit filtered, capped hit rows."""
    _header(out, ci=args.ci)
    for qname, qcontigs in _genome_records(args.queries):
        hits = db.query(qname, *qcontigs, median=args.median,
                        robust=args.robust, cutoff=_screen_val(args.screen),
                        faster_small=args.faster_small,
                        learned_ani=_learned(args.learned_ani),
                        est_ci=args.ci)
        hits = [h for h in hits
                if max(h.query_fraction,
                       h.reference_fraction) * 100 >= args.min_af]
        # max_results cap, best ANI first (CommandParams.max_results;
        # the reference pins it to 1e9, lib.rs:585)
        hits.sort(key=lambda h: -h.identity)
        for h in hits[:args.max_results]:
            ci = (h.ci_low, h.ci_high) if args.ci else None
            _emit(out, h.reference_name, h.query_name, h.identity,
                  h.reference_fraction, h.query_fraction, ci)


def cmd_dist(args) -> int:
    from .database import Database
    args.queries = _expand_lists(args.queries, args.query_lists)
    refs = _expand_lists(args.refs, args.ref_lists)
    if not args.queries or not refs:
        print("error: need at least one query (-q/--ql) and one "
              "reference (-r/--rl)", file=sys.stderr)
        return 2
    db = Database(compression=args.compression,
                  marker_compression=args.marker_compression, k=args.k)
    db.sketch_many(_genome_records(refs))
    with _out_stream(args.output_file) as out:
        _run_queries(db, args, out)
    return 0


def cmd_search(args) -> int:
    from .database import Database
    args.queries = _expand_lists(args.queries, args.query_lists)
    if not args.queries:
        print("error: no query genomes (positional or --ql)",
              file=sys.stderr)
        return 2
    db = Database.open(args.database) if not args.preload \
        else Database.load(args.database)
    if args.mesh:
        return _search_sharded(db, args)
    with _out_stream(args.output_file) as out:
        _run_queries(db, args, out)
    return 0


def _search_sharded(db, args) -> int:
    """search --mesh DBxBATCH: the whole query stream through the
    mesh-sharded engine (parallel.search.ShardedDatabaseSearch)."""
    if args.ci:
        print("error: --ci is not supported with --mesh", file=sys.stderr)
        return 2
    try:
        db_ax, batch_ax = (int(t) for t in args.mesh.lower().split("x"))
    except ValueError:
        print(f"error: bad --mesh {args.mesh!r} (expected DBxBATCH)",
              file=sys.stderr)
        return 2
    from .parallel.mesh import make_mesh
    from .parallel.search import ShardedDatabaseSearch

    mesh = make_mesh(db=db_ax, batch=batch_ax)
    searcher = ShardedDatabaseSearch(
        db, mesh, cutoff=_screen_val(args.screen),
        learned_ani=_learned(args.learned_ani), median=args.median,
        robust=args.robust, faster_small=args.faster_small)
    named = list(_genome_records(args.queries))
    all_hits = searcher.query_many(named)
    with _out_stream(args.output_file) as out:
        _header(out)
        for hits in all_hits:
            hits = [h for h in hits
                    if max(h.query_fraction,
                           h.reference_fraction) * 100 >= args.min_af]
            hits.sort(key=lambda h: -h.identity)
            for h in hits[:args.max_results]:
                _emit(out, h.reference_name, h.query_name, h.identity,
                      h.reference_fraction, h.query_fraction)
    return 0


def cmd_triangle(args) -> int:

    from .engine.batch import triangle
    from .oracle.chain import ChainConfig
    from .ops.sketch import sketch_genomes_device
    from .params import SketchParams

    params = SketchParams(c=args.compression,
                          marker_c=args.marker_compression, k=args.k)
    genomes = _expand_lists(args.genomes, args.list_files)
    if len(genomes) < 2:
        print("error: triangle needs at least two genomes", file=sys.stderr)
        return 2
    named = list(_genome_records(genomes))
    sketches = sketch_genomes_device(named, params)
    names = [s.name for s in sketches]
    cfg = ChainConfig(est_ci=True) if args.ci else ChainConfig()
    if args.mesh:
        # mesh-parallel triangle (parallel.dist.sharded_triangle)
        try:
            db_ax, batch_ax = (int(t) for t in args.mesh.lower().split("x"))
        except ValueError:
            print(f"error: bad --mesh {args.mesh!r} (expected DBxBATCH)",
                  file=sys.stderr)
            return 2
        if args.ci:
            print("error: --ci is not supported with --mesh",
                  file=sys.stderr)
            return 2
        from .engine.batch import default_budgets, stack_sketches
        from .parallel.dist import sharded_triangle
        from .parallel.mesh import make_mesh

        mesh = make_mesh(db=db_ax, batch=batch_ax)
        batch = stack_sketches(sketches)
        budgets = default_budgets(sketches, batch, cfg)
        ri, qi, out = sharded_triangle(batch, mesh, cfg=cfg,
                                       budgets=budgets)
    else:
        ri, qi, out = triangle(sketches, cfg=cfg)
    key = "ani_median" if args.median else \
        "ani_robust" if args.robust else "ani_mean"

    with _out_stream(args.output_file) as fh:
        if args.full_matrix:
            # PHYLIP-style lower-triangular matrix (skani triangle's
            # default output; this CLI defaults to the sparse TSV form,
            # skani's -E/--sparse, which suits pipeline use better)
            vals = {}
            for i in range(len(ri)):
                v = float(out[key][i])
                v = 100.0 - 100.0 * v if args.distance else 100.0 * v
                vals[(max(ri[i], qi[i]), min(ri[i], qi[i]))] = v
            diag = 0.0 if args.distance else 100.0
            fh.write(f"{len(names)}\n")
            for i, name in enumerate(names):
                row = [name]
                row += [f"{vals.get((i, j), 0.0):.2f}" for j in range(i)]
                row.append(f"{diag:.2f}")
                fh.write("\t".join(row) + "\n")
            return 0
        _header(fh, ci=args.ci)
        for i in range(len(ri)):
            ani = float(out[key][i])
            af_q = float(out["af_query"][i])
            af_r = float(out["af_ref"][i])
            if ani <= 0.1 or max(af_q, af_r) * 100 < args.min_af:
                continue
            if args.distance:
                ani = 1.0 - ani
            ci = (float(out["ani_ci_low"][i]),
                  float(out["ani_ci_high"][i])) if args.ci else None
            _emit(fh, names[ri[i]], names[qi[i]], ani, af_r, af_q, ci)
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="skani-tpu",
        description="TPU-native ANI computation (skani method)")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("sketch", help="sketch genomes into a database")
    p.add_argument("genomes", nargs="*")
    p.add_argument("-l", "--list", dest="list_files", action="append",
                   help="file listing genome paths, one per line")
    p.add_argument("-o", "--output", required=True, help="database folder")
    p.add_argument("--format", choices=["consolidated", "separated"],
                   default=None)
    _add_sketch_params(p)
    p.set_defaults(func=cmd_sketch)

    p = sub.add_parser("dist", help="ANI between query and reference genomes")
    p.add_argument("-q", "--queries", nargs="*", default=[])
    p.add_argument("-r", "--refs", nargs="*", default=[])
    p.add_argument("--ql", dest="query_lists", action="append",
                   help="file listing query paths, one per line")
    p.add_argument("--rl", dest="ref_lists", action="append",
                   help="file listing reference paths, one per line")
    _add_sketch_params(p)
    _add_query_params(p)
    p.set_defaults(func=cmd_dist)

    p = sub.add_parser("search", help="search a pre-sketched database")
    p.add_argument("queries", nargs="*")
    p.add_argument("--ql", dest="query_lists", action="append",
                   help="file listing query paths, one per line")
    p.add_argument("-d", "--database", required=True)
    p.add_argument("--preload", action="store_true",
                   help="load all sketches in memory up front")
    p.add_argument("--mesh", default=None, metavar="DBxBATCH",
                   help="run the search sharded over a device mesh, e.g. "
                        "--mesh 4x2 (db axis x batch axis; requires "
                        "db*batch devices)")
    _add_query_params(p)
    p.set_defaults(func=cmd_search)

    p = sub.add_parser("triangle", help="all-vs-all ANI (lower triangle)")
    p.add_argument("genomes", nargs="*")
    p.add_argument("-l", "--list", dest="list_files", action="append",
                   help="file listing genome paths, one per line")
    p.add_argument("--full-matrix", action="store_true",
                   help="PHYLIP-style lower-triangular matrix output "
                        "(skani triangle's default form)")
    p.add_argument("--distance", action="store_true",
                   help="output distance (100 - ANI) instead of ANI")
    p.add_argument("-E", "--sparse", action="store_true",
                   help="sparse TSV edge list (this CLI's default; flag "
                        "kept for skani compatibility)")
    p.add_argument("--mesh", default=None, metavar="DBxBATCH",
                   help="run the triangle tiled over a device mesh, e.g. "
                        "--mesh 4x2 (results identical to single-device)")
    _add_sketch_params(p)
    _add_query_params(p)
    p.set_defaults(func=cmd_triangle)
    return ap


def main(argv=None) -> int:
    from .utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    rc = args.func(args)
    from .utils import profiling
    if profiling.enabled():
        import json
        snap = profiling.stats().snapshot()
        print("stats: " + json.dumps(snap), file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
