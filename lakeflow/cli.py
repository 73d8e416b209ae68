"""lakeflow command-line interface.

    python -m lakeflow list-queries
    python -m lakeflow query q1_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m lakeflow import mailgun --path .../mailgun.delivered --table silver_mailgun
    python -m lakeflow gold-create --schema gold
    python -m lakeflow explain q5_local_supplier_volume
    python -m lakeflow compact /data/events --zorder user_id,ts
    python -m lakeflow table history /data/tx_events
    python -m lakeflow table vacuum /data/tx_events --keep-last 3
    python -m lakeflow shard-export --input /data/docs --output /data/shards \
        --key doc_id --n-shards 64
"""

from __future__ import annotations

import argparse
import sys


def _spark(app: str):
    from lakeflow import get_spark

    spark = get_spark(app)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_list_queries(_args) -> int:
    from lakeflow.plans import QUERIES

    for name, spec in sorted(QUERIES.items()):
        oracle = "oracle" if spec.oracle else "rows-only"
        print(f"{name:32s} [{oracle:9s}] {spec.description}")
    return 0


def cmd_query(args) -> int:
    from lakeflow.plans import QUERIES

    spec = QUERIES.get(args.name)
    if spec is None:
        print(f"unknown query: {args.name} (see list-queries)", file=sys.stderr)
        return 2
    df = spec.fn(_spark(f"lakeflow-{args.name}"), args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


def cmd_explain(args) -> int:
    from lakeflow.plans import QUERIES

    spec = QUERIES.get(args.name)
    if spec is None:
        print(f"unknown query: {args.name} (see list-queries)", file=sys.stderr)
        return 2
    spec.fn(_spark("lakeflow-explain"), args.sf_dir).explain("formatted")
    return 0


def cmd_import(args) -> int:
    from lakeflow.pipelines import (
        import_iterable_events,
        import_mailgun_events,
        import_mongo_notifications,
        import_topic_dump,
    )
    from lakeflow.sinks import save_table

    spark = _spark(f"lakeflow-import-{args.source}")
    if args.source == "mailgun":
        if not args.tags:
            print("--tags required for mailgun (deployment-specific)", file=sys.stderr)
            return 2
        df = import_mailgun_events(spark, args.path, args.tags.split(","))
    elif args.source == "iterable":
        df = import_iterable_events(spark, args.path)
    elif args.source == "mongo":
        df = import_mongo_notifications(spark, args.path)
    elif args.source == "kafka":
        name, df = import_topic_dump(spark, args.path)
        args.table = args.table or name
    else:  # pragma: no cover - argparse restricts choices
        return 2
    if not args.table:
        print("--table required for this source", file=sys.stderr)
        return 2
    save_table(df, args.table, mode=args.mode)
    print(f"wrote {spark.table(args.table).count()} rows to {args.table}")
    return 0


def cmd_gold_create(args) -> int:
    from lakeflow.pipelines.gold import create_card_funnel_schema

    stmts = create_card_funnel_schema(_spark("lakeflow-gold"), args.schema, args.prefix)
    print(f"executed {len(stmts)} DDL statements in schema {args.schema}")
    return 0


def cmd_compact(args) -> int:
    from lakeflow.sinks.layout import compact_parquet, optimize_table

    spark = _spark("lakeflow-compact")
    if args.zorder:
        x, y = args.zorder.split(",")
        n = optimize_table(spark, args.path, x.strip(), y.strip(), args.target_bytes)
    else:
        n = compact_parquet(spark, args.path, args.target_bytes)
    print(f"compacted {args.path} -> {n} file(s)")
    return 0


def cmd_table(args) -> int:
    from lakeflow.sinks import txtable

    if args.action == "history":
        for h in txtable.history(args.path):
            print(f"v{h['version']:<4d} {h['op']:<12s} {h['n_files']} file(s)")
    elif args.action == "vacuum":
        n = txtable.vacuum_table(
            args.path, keep_last=args.keep_last, min_age_seconds=args.min_age
        )
        print(f"vacuumed {n} unreferenced data file(s)")
    elif args.action == "show":
        df = txtable.read_table(_spark("lakeflow-table"), args.path, args.version)
        df.show(args.limit, truncate=False)
    return 0


def cmd_shard_export(args) -> int:
    from lakeflow.sinks.shards import write_training_shards

    spark = _spark("lakeflow-shards")
    df = spark.read.parquet(args.input)
    manifest = write_training_shards(
        df, args.output, args.key, args.n_shards,
        one_file_per_shard=args.one_file_per_shard,
    )
    for r in manifest.orderBy("shard").collect():
        print(
            f"shard={r['shard']:<4d} rows={r['n_rows']:<10d} "
            f"files={r['n_files']:<4d} bytes={r['bytes']}"
        )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lakeflow")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list-queries").set_defaults(fn=cmd_list_queries)

    q = sub.add_parser("query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    e = sub.add_parser("explain")
    e.add_argument("name")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    e.set_defaults(fn=cmd_explain)

    im = sub.add_parser("import")
    im.add_argument("source", choices=["mailgun", "iterable", "mongo", "kafka"])
    im.add_argument("--path", required=True)
    im.add_argument("--table", default=None)
    im.add_argument("--mode", default="overwrite")
    im.add_argument(
        "--tags",
        default=None,
        help="comma-separated relevant-tag list (mailgun; deployment config)",
    )
    im.set_defaults(fn=cmd_import)

    g = sub.add_parser("gold-create")
    g.add_argument("--schema", default="gold")
    g.add_argument("--prefix", default="")
    g.set_defaults(fn=cmd_gold_create)

    c = sub.add_parser("compact", help="rewrite a parquet table to target-size files")
    c.add_argument("path")
    c.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    c.add_argument("--zorder", default=None, help="colX,colY to Z-order while compacting")
    c.set_defaults(fn=cmd_compact)

    t = sub.add_parser("table", help="manifest-committed table ops (txtable)")
    t.add_argument("action", choices=["history", "vacuum", "show"])
    t.add_argument("path")
    t.add_argument("--keep-last", type=int, default=2)
    t.add_argument("--min-age", type=float, default=3600.0,
                   help="vacuum: only delete unreferenced files older than this (s)")
    t.add_argument("--version", type=int, default=None)
    t.add_argument("--limit", type=int, default=20)
    t.set_defaults(fn=cmd_table)

    sh = sub.add_parser("shard-export", help="deterministic training-shard export")
    sh.add_argument("--input", required=True)
    sh.add_argument("--output", required=True)
    sh.add_argument("--key", required=True)
    sh.add_argument("--n-shards", type=int, required=True)
    sh.add_argument("--one-file-per-shard", action="store_true")
    sh.set_defaults(fn=cmd_shard_export)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
