"""CLI entry point: ``python -m smartbulkcopy_spark <config.json>``.

Mirrors the reference's Program.Main (reference: client/Program.cs:9-40):
loads the JSON config, runs the copy, exits with the reference's codes
(0 ok, 1 config/connection, 2 mismatch, 3 copy errors).
"""

from __future__ import annotations

import sys

from smartbulkcopy_spark.executor import EXIT_CONFIG, run_from_config_file


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1:
        print("usage: python -m smartbulkcopy_spark <config.json>")
        return EXIT_CONFIG
    report = run_from_config_file(argv[0])
    for m in report.messages:
        print(m)
    return report.exit_code


if __name__ == "__main__":
    sys.exit(main())
