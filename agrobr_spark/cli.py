"""Command-line surface (argparse, stdlib-only).

Reference: agrobr/cli.py — a typer app with ``health`` / ``doctor`` /
``cache status`` / ``datasets`` / ``snapshot list|create|delete`` and
per-source fetch commands. This engine re-exposes the offline-capable
subset over the Spark implementations; network-fetch commands take a
captured payload path instead of a URL (the engine is a library — the
scheduler owns fetching at scale).

Commands:
    datasets                      list the 12 semantic datasets
    contracts                     list registered contracts
    connectors                    list connector entry points
    queries                       list the operator catalog
    query <name> [--sf-dir DIR]   run one catalog query, print rows
    doctor [--store PATH]         registry/store diagnostics (JSON)
    freshness <history.parquet>   SLA freshness report
    sla [source]                  dump SLA registry (JSON)
    bench                         delegate to bench.py

Run with ``python -m agrobr_spark.cli <cmd>``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from agrobr_spark.session import get_spark

    return get_spark()


def cmd_datasets(_args) -> int:
    from agrobr_spark.datasets.registry import DATASETS

    for name, contract in sorted(DATASETS.items()):
        print(f"{name}\t{contract}")
    return 0


def cmd_contracts(_args) -> int:
    from agrobr_spark.contracts import all_contracts

    for name in sorted(all_contracts()):
        print(name)
    return 0


def cmd_connectors(_args) -> int:
    from agrobr_spark.sources import connectors  # noqa: F401 — registration
    from agrobr_spark.sources.connectors._base import list_connectors

    for name in list_connectors():
        print(name)
    return 0


def cmd_queries(_args) -> int:
    from agrobr_spark.queries import catalog

    for name, entry in catalog().items():
        kind = "oracle" if entry.oracle else "rows-only"
        print(f"{name}\t{kind}")
    return 0


def cmd_query(args) -> int:
    from agrobr_spark.queries import catalog

    cat = catalog()
    if args.name not in cat:
        print(f"unknown query {args.name!r}; see `queries`", file=sys.stderr)
        return 2
    df = cat[args.name].fn(_spark(), args.sf_dir)
    for row in df.limit(args.limit).collect():
        print(json.dumps(row.asDict(), default=str, ensure_ascii=False))
    return 0


def cmd_doctor(args) -> int:
    from agrobr_spark.health import doctor

    print(json.dumps(doctor(_spark(), store_path=args.store), indent=2))
    return 0


def cmd_freshness(args) -> int:
    from agrobr_spark.sla import freshness_report

    spark = _spark()
    hist = spark.read.parquet(args.history)
    for row in freshness_report(
        hist, source_col=args.source_col, date_col=args.date_col
    ).collect():
        print(json.dumps(row.asDict(), default=str, ensure_ascii=False))
    return 0


def cmd_sla(args) -> int:
    from agrobr_spark.sla import SLA_REGISTRY, get_sla

    if args.source:
        print(json.dumps(get_sla(args.source).to_dict(), indent=2))
    else:
        print(json.dumps(
            {name: sla.to_dict() for name, sla in sorted(SLA_REGISTRY.items())},
            indent=2,
        ))
    return 0


def cmd_bench(_args) -> int:
    import runpy

    runpy.run_path("bench.py", run_name="__main__")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="agrobr-spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("datasets").set_defaults(fn=cmd_datasets)
    sub.add_parser("contracts").set_defaults(fn=cmd_contracts)
    sub.add_parser("connectors").set_defaults(fn=cmd_connectors)
    sub.add_parser("queries").set_defaults(fn=cmd_queries)

    q = sub.add_parser("query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    d = sub.add_parser("doctor")
    d.add_argument("--store", default=None)
    d.set_defaults(fn=cmd_doctor)

    f = sub.add_parser("freshness")
    f.add_argument("history")
    f.add_argument("--source-col", default="source")
    f.add_argument("--date-col", default="data")
    f.set_defaults(fn=cmd_freshness)

    s = sub.add_parser("sla")
    s.add_argument("source", nargs="?", default=None)
    s.set_defaults(fn=cmd_sla)

    sub.add_parser("bench").set_defaults(fn=cmd_bench)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
