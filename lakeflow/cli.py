"""lakeflow command-line interface.

    python -m lakeflow list-queries
    python -m lakeflow query q1_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m lakeflow import mailgun --path .../mailgun.delivered --table silver_mailgun
    python -m lakeflow gold-create --schema gold
    python -m lakeflow explain q5_local_supplier_volume
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

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
