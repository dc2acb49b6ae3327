"""Engine CLI (ref: the reference ships an `agrobr` CLI;
tests/test_cli.py, 407 LoC). Subcommands mirror the operational
surface:

    python -m agrobr_spark datasets                 # list datasets
    python -m agrobr_spark contracts                # list contracts
    python -m agrobr_spark queries [--tag A1]       # list catalog queries
    python -m agrobr_spark run <query> [--sf DIR] [--limit N] [--explain]
    python -m agrobr_spark validate <contract> <parquet_path>
    python -m agrobr_spark bench [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from agrobr_spark.session import get_spark

    return get_spark(app_name="agrobr-cli")


def cmd_datasets(_args) -> int:
    from agrobr_spark.datasets.registry import DATASETS

    for name, contract in sorted(DATASETS.items()):
        print(f"{name}\t{contract}")
    return 0


def cmd_contracts(_args) -> int:
    from agrobr_spark.contracts import contract_names, get_contract

    for name in contract_names():
        c = get_contract(name)
        print(f"{name}\tv{c.version}\tpk=({', '.join(c.primary_key)})")
    return 0


def cmd_queries(args) -> int:
    from agrobr_spark.queries import catalog

    for name, entry in sorted(catalog().items()):
        if args.tag and args.tag not in entry.tags:
            continue
        oracle = "oracle" if entry.oracle else "rows-only"
        print(f"{name}\t[{', '.join(entry.tags)}]\t{oracle}")
    return 0


def cmd_run(args) -> int:
    from agrobr_spark.queries import catalog

    entry = catalog().get(args.query)
    if entry is None:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    df = entry.fn(_spark(), args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    df.show(args.limit, truncate=False)
    return 0


def cmd_validate(args) -> int:
    from agrobr_spark.contracts import get_contract

    contract = get_contract(args.contract)
    df = _spark().read.parquet(args.path)
    missing = contract.missing_columns(df)
    if missing:
        print(json.dumps({"valid": False, "missing_columns": missing}))
        return 1
    row = contract.validation_query(df).collect()[0].asDict()
    valid = all(v == 0 for k, v in row.items() if k != "linhas")
    print(json.dumps({"valid": valid, **row}))
    return 0 if valid else 1


def cmd_bench(args) -> int:
    import os
    import subprocess

    env = dict(os.environ)
    if args.sf:
        env["SPARK_GRAFT_SF_DIR"] = args.sf
    return subprocess.call([sys.executable, "bench.py"], env=env)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="agrobr_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("datasets")
    sub.add_parser("contracts")
    q = sub.add_parser("queries")
    q.add_argument("--tag")
    r = sub.add_parser("run")
    r.add_argument("query")
    r.add_argument("--sf", default="/root/testdata/sf0.001")
    r.add_argument("--limit", type=int, default=20)
    r.add_argument("--explain", action="store_true")
    v = sub.add_parser("validate")
    v.add_argument("contract")
    v.add_argument("path")
    b = sub.add_parser("bench")
    b.add_argument("--sf")
    args = p.parse_args(argv)
    return {
        "datasets": cmd_datasets,
        "contracts": cmd_contracts,
        "queries": cmd_queries,
        "run": cmd_run,
        "validate": cmd_validate,
        "bench": cmd_bench,
    }[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
