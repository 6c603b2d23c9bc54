"""CLI entry point.

    python -m ssn_college_software_architecture_assignments__spark new-connector <name>

generates the reference's per-connector project structure
(/root/reference/README.md:73-84) wired to this engine's Extract /
Transform / Load components — see :mod:`.scaffold`.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="ssn_college_software_architecture_assignments__spark"
    )
    sub = parser.add_subparsers(dest="command", required=True)
    newc = sub.add_parser(
        "new-connector", help="generate a per-connector ETL project scaffold"
    )
    newc.add_argument("name", help="connector name (snake_case)")
    newc.add_argument(
        "--dir", default=".", help="parent directory for the scaffold (default: .)"
    )
    newc.add_argument(
        "--endpoint", default="records", help="default endpoint path for the API"
    )
    args = parser.parse_args(argv)

    if args.command == "new-connector":
        from .scaffold import new_connector

        root = new_connector(args.name, dest_dir=args.dir, default_endpoint=args.endpoint)
        print(f"created connector scaffold at {root}")
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
