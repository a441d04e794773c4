"""Command-line entry point — the spark-submit launch path.

    spark-submit --py-files kgmwcp.zip -m ... run_pipeline.py \
        --input /data/documents --output /data/kg --buckets 4096

or locally: ``python -m kgmwcp --input ... --output ...``.

The module ships to executors as a zip (see ``package_pyfiles``); rule
compilation happens lazily inside each python worker on first batch (the
analogue of the reference's multiprocessing initializer,
mwcp/utils/multi_proc.py:15-18).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import zipfile
from typing import Optional

__all__ = ["main", "package_pyfiles"]


def package_pyfiles(out_path: str = "dist/kgmwcp.zip") -> str:
    """Zip the package for spark-submit --py-files."""
    root = pathlib.Path(__file__).resolve().parent.parent
    out = pathlib.Path(out_path)
    if not out.is_absolute():
        out = root / out
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted((root / "kgmwcp").rglob("*.py")):
            zf.write(path, str(path.relative_to(root)))
    return str(out)


def _parse_args(argv: Optional[list] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog="kgmwcp", description="PySpark KG-construction pipeline (MWCP semantics)")
    parser.add_argument("--input", default=None,
                        help="documents(repo,path,commit,lang,content[,route]): "
                             "a parquet path, an Iceberg table/path with "
                             "--input-format iceberg, or '-' to read one raw "
                             "sample from stdin (required unless "
                             "--schema/--serve)")
    parser.add_argument("--name", default="stdin.bin",
                        help="sample filename for --input - (stdin ingest)")
    parser.add_argument("--input-format", default="parquet",
                        choices=["parquet", "iceberg"],
                        help="source format; 'iceberg' loads via "
                             "spark.read.format('iceberg') (requires the "
                             "Iceberg runtime on the cluster — partition "
                             "pruning and snapshots ride the same "
                             "DataFrame code)")
    parser.add_argument("--output", default=None,
                        help="output directory for KG tables "
                             "(required unless --schema)")
    parser.add_argument("--master", default=None, help="spark master (default: local[*])")
    parser.add_argument("--buckets", type=int, default=256,
                        help="lineage bucket count (stable across runs)")
    parser.add_argument("--extract-partitions", type=int, default=None,
                        help="repartition width for the extract stage")
    parser.add_argument("--knowledge-base", default="{}",
                        help="JSON dict of external knowledge for parsers")
    parser.add_argument("--parser", default=None,
                        help="restrict routing to one parser group (default: auto)")
    parser.add_argument("--parser-dir", dest="parser_dirs", action="append",
                        default=[], metavar="DIR",
                        help="register an external directory of Rule modules "
                             "(repeatable; reference mwcp --parser-dir, "
                             "mwcp/cli.py:108-113).  Groups appear in --list, "
                             "auto-routing, --serve, and the extract stage; "
                             "the directory must be visible on executors "
                             "(shared FS or spark-submit --files)")
    parser.add_argument("--parser-pkg", dest="parser_pkgs", action="append",
                        default=[], metavar="PKG",
                        help="register an INSTALLED parser-collection package "
                             "by importable dotted name (repeatable; reference "
                             "register_parser_package, mwcp/registry.py:199-227). "
                             "Packages advertised via the 'kgmwcp.parsers' "
                             "entry-point group are auto-discovered without "
                             "this flag.  Must be pip-installed on executors")
    parser.add_argument("--router", action="store_true",
                        help="enable the JVM signature router stage (YARA-routing "
                             "analogue): byte signatures pre-route each root to "
                             "its parser group")
    parser.add_argument("--yara-repo", default=None, metavar="DIR",
                        help="route via a directory of .yara/.yar rules with "
                             "mwcp= meta (reference mwcp/runner.py:158-209), "
                             "compiled into JVM Column predicates; rules "
                             "outside the supported subset warn-and-skip "
                             "(their rows auto-dispatch)")
    parser.add_argument("--no-resume", action="store_true",
                        help="ignore existing checkpoint manifests")
    parser.add_argument("--streaming", action="store_true",
                        help="drain --input as a drop-folder via Structured Streaming")
    parser.add_argument("--stix", action="store_true",
                        help="also write STIX 2.1 bundles (one per root sample)")
    parser.add_argument("--format", dest="render_format", default=None,
                        choices=["text", "md", "html", "csv"],
                        help="also render per-root reports as text/markdown/"
                             "html files under <output>/reports_<format>/; "
                             "'csv' writes the reference's legacy long CSV "
                             "(MD5, MetaIndex, Category, Field, Value) as "
                             "<output>/reports_legacy.csv")
    parser.add_argument("--schema", action="store_true",
                        help="print the JSON Schema of report_json documents "
                             "and exit (--input/--output not needed)")
    parser.add_argument("--export-iceberg", default=None, metavar="PREFIX",
                        help="additionally export the final KG tables to "
                             "Iceberg as <PREFIX>_<table> (e.g. "
                             "warehouse.db.kg -> warehouse.db.kg_triples); "
                             "requires the Iceberg runtime on the cluster. "
                             "The --output directory still holds lineage "
                             "manifests and the parquet copies")
    parser.add_argument("--list", dest="list_parsers", action="store_true",
                        help="list registered parser groups and rules as "
                             "JSON and exit (reference `mwcp list`; "
                             "--input/--output not needed)")
    parser.add_argument("--serve", action="store_true",
                        help="start the REST serving layer (GET /parsers, "
                             "POST /run_parser[/<group>]) instead of a batch "
                             "run; --input/--output not needed")
    parser.add_argument("--host", default="127.0.0.1",
                        help="bind address for --serve")
    parser.add_argument("--port", type=int, default=8080,
                        help="bind port for --serve")
    parser.add_argument("--greedy", action="store_true",
                        help="run every matching parser per file instead of "
                             "first-match (reference dispatcher greedy mode)")
    parser.add_argument("--include-file-data", action="store_true",
                        help="embed base64 payload bytes in File report "
                             "elements (implies --residuals)")
    parser.add_argument("--residuals", action="store_true",
                        help="carry residual-file payload bytes through "
                             "extraction, write a content-addressed "
                             "<output>/residuals parquet table and "
                             "materialize <output>/residual_files/ with "
                             "collision-safe {md5:5}_{name} filenames")
    return parser.parse_args(argv)


def _config_from_args(args):
    """The ONE PipelineConfig constructor from CLI flags — shared by the
    batch, streaming, stdin, and --serve paths so a flag added to one
    cannot silently drift from the others (review finding: the serve
    path hand-copied the literal and dropped extract_partitions and the
    residuals implication)."""
    from kgmwcp.pipeline import PipelineConfig

    return PipelineConfig(
        n_buckets=args.buckets,
        extract_partitions=args.extract_partitions,
        knowledge_base=json.loads(args.knowledge_base),
        use_router=args.router,
        yara_repo=args.yara_repo,
        emit_file_data=args.residuals or args.include_file_data,
        greedy=args.greedy,
        include_file_data=args.include_file_data,
        rule_dirs=tuple(args.parser_dirs),
        rule_packages=tuple(args.parser_pkgs),
    )


def main(argv: Optional[list] = None, spark=None) -> dict:
    # --schema is a real argparse flag (not an argv pre-scan, which
    # would fire on any token equal to '--schema' — e.g. a mistyped
    # option value — and silently skip the requested run): all other
    # flags are still validated, then the schema branch exits early.
    args = _parse_args(argv)
    if args.include_file_data:
        # genuinely implies --residuals (the help text's promise): the
        # residuals table + residual_files/ materialization come too;
        # applied once here so every branch (batch/stdin/serve) agrees
        args.residuals = True
    if args.schema:
        from kgmwcp.schema import report_json_schema

        print(json.dumps(report_json_schema(), indent=4))
        return {}
    # entry-point auto-discovery (reference register_entry_points,
    # mwcp/registry.py:131-141): installed collections advertising the
    # 'kgmwcp.parsers' group register without any flag.  Their package
    # names join rule_packages so extract workers re-import them by name.
    from kgmwcp.engine.registry import entry_point_packages

    args.parser_pkgs = list(
        dict.fromkeys(list(args.parser_pkgs) + entry_point_packages()))
    if args.parser_dirs or args.parser_pkgs:
        # driver-side registration so --list / --serve / routing see the
        # external groups NOW; the extract workers re-register from
        # config.rule_dirs/rule_packages (engine/registry.py is
        # idempotent per process)
        from kgmwcp.engine.registry import ensure_registered

        ensure_registered(args.parser_dirs, args.parser_pkgs)
    if args.list_parsers:
        # reference `mwcp list` (cli.py:148-177): name/source/description
        # per parser; here grouped by routing group, JSON only (tabulate
        # is not in the container; the text renderers live in render.py)
        from kgmwcp.engine.parsers import RULE_GROUPS
        from kgmwcp.engine.registry import rule_source

        listing = [
            {
                "group": group,
                "rules": [
                    {"name": rule.name(), "description": rule.DESCRIPTION,
                     "source": rule_source(rule, group)}
                    for rule in rules
                ],
            }
            for group, rules in sorted(RULE_GROUPS.items())
        ]
        print(json.dumps(listing, indent=4))
        return {}
    import sys as _sys0

    if args.serve:
        from kgmwcp.server import make_server
        from kgmwcp.session import get_spark

        owns_spark = spark is None
        spark = spark or get_spark("kgmwcp-serve", master=args.master)
        httpd = make_server(spark, host=args.host, port=args.port,
                            config=_config_from_args(args))
        host, port = httpd.server_address[:2]
        print(f"serving on http://{host}:{port}", file=_sys0.stderr)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.server_close()
            if owns_spark:
                spark.stop()
        return {}
    if not args.input or not args.output:
        print("error: --input and --output are required "
              "(unless --schema/--serve)", file=_sys0.stderr)
        raise SystemExit(2)
    if args.streaming and args.input == "-":
        print("error: --streaming cannot read from stdin", file=_sys0.stderr)
        raise SystemExit(2)
    if args.streaming and args.input_format == "iceberg":
        # the streaming source drains a parquet drop-folder; an iceberg
        # catalog identifier would silently become a bogus local path
        print("error: --streaming supports --input-format parquet only "
              "(the streaming source drains a parquet drop-folder)",
              file=_sys0.stderr)
        raise SystemExit(2)
    from kgmwcp.pipeline import Pipeline
    from kgmwcp.session import get_spark

    owns_spark = spark is None
    spark = spark or get_spark("kgmwcp", master=args.master)
    config = _config_from_args(args)
    pipe = Pipeline(config)

    import pathlib as _pathlib
    import sys as _sys

    if (args.input != "-" and args.input_format == "parquet"
            and not _pathlib.Path(args.input).exists()):
        # iceberg inputs are catalog identifiers/paths resolved by the
        # runtime, not local filesystem paths; '-' is stdin
        print(f"error: input path does not exist: {args.input}", file=_sys.stderr)
        raise SystemExit(1)
    if args.parser:
        from kgmwcp.engine.parsers import RULE_GROUPS

        if args.parser not in RULE_GROUPS:
            print(f"error: unknown parser group: {args.parser} "
                  f"(known: {', '.join(sorted(RULE_GROUPS))})", file=_sys.stderr)
            raise SystemExit(1)
    # surface the active external knowledge — an omitted --knowledge-base
    # silently changes parser output (e.g. the foo secret element)
    print(f"knowledge_base keys: {sorted(config.knowledge_base) or '(none)'}",
          file=_sys.stderr)

    try:
        if args.no_resume:
            # applies to EVERY input mode (a stdin run reusing an output
            # dir must also be able to demand a clean slate — review
            # finding: the rmtree briefly lived in the batch-only branch)
            import shutil

            shutil.rmtree(args.output, ignore_errors=True)
        if args.streaming:
            from kgmwcp.streaming.ingest import run_available_now

            tables = run_available_now(spark, args.input, args.output, config)
        else:
            if args.input == "-":
                # S3 stdin ingest (reference `mwcp parse <parser> -`):
                # one raw sample from stdin, shared builder with the
                # REST server.  NOT checkpointed: resume semantics would
                # mix a previous run's committed sample into this run's
                # printed report when the output dir is reused
                # (code-review finding).
                from kgmwcp.stages.ingest import single_sample_docs

                docs = single_sample_docs(
                    spark, _sys.stdin.buffer.read(), args.name, repo="stdin",
                    route=args.parser)
                tables = pipe.run(docs)
            else:
                if args.input_format == "iceberg":
                    docs = spark.read.format("iceberg").load(args.input)
                else:
                    docs = spark.read.parquet(args.input)
                if args.parser:
                    from pyspark.sql import functions as F

                    docs = docs.withColumn("route", F.lit(args.parser))
                tables = pipe.run_checkpointed(spark, docs, args.output)

        summary = {}
        table_names = ("triples", "nodes", "edges", "reports")
        if args.stix:
            table_names += ("stix",)
        if args.residuals:
            table_names += ("residuals",)
        for name in table_names:
            tables[name].write.mode("overwrite").parquet(
                f"{args.output}/{name}")
            # read back the materialized copy once: count + optional
            # catalog export both ride it, and the extract stage never
            # re-runs per sink
            materialized = spark.read.parquet(f"{args.output}/{name}")
            summary[name] = materialized.count()
            if args.export_iceberg:
                (materialized
                 .writeTo(f"{args.export_iceberg}_{name}")
                 .createOrReplace())
        metrics = Pipeline.metrics(tables["records"])
        metrics.write.mode("overwrite").parquet(f"{args.output}/metrics")
        if args.residuals:
            # reference report.py:861-885 UX: actual files on disk, named
            # {md5[:5]}_{sanitized-name}; driver-side streaming write
            from kgmwcp.engine.strings import collision_safe_name

            res_dir = _pathlib.Path(args.output) / "residual_files"
            res_dir.mkdir(parents=True, exist_ok=True)
            n_written = 0
            residuals = spark.read.parquet(f"{args.output}/residuals")
            for row in residuals.select("md5", "name", "data").toLocalIterator():
                (res_dir / collision_safe_name(row["md5"], row["name"])
                 ).write_bytes(bytes(row["data"]))
                n_written += 1
            summary["residual_files"] = n_written
        if args.render_format == "csv":
            from kgmwcp.render import write_legacy_csv

            summary["reports_csv"] = write_legacy_csv(
                spark.read.parquet(f"{args.output}/reports"),
                f"{args.output}/reports_legacy.csv",
            )
        elif args.render_format:
            from kgmwcp.render import render_reports_df

            summary[f"reports_{args.render_format}"] = render_reports_df(
                spark.read.parquet(f"{args.output}/reports"),
                f"{args.output}/reports_{args.render_format}",
                args.render_format,
            )
        out_doc = {"output": args.output, "counts": summary}
        if args.input == "-":
            # reference `mwcp parse` prints the report itself
            out_doc["report"] = [
                json.loads(r["report_json"])
                for r in spark.read.parquet(f"{args.output}/reports")
                .select("report_json").collect()
            ]
        print(json.dumps(out_doc))
        return summary
    finally:
        if owns_spark:
            spark.stop()


if __name__ == "__main__":
    main()
