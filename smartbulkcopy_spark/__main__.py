"""CLI entry point: ``python -m smartbulkcopy_spark <config.json>``.

Mirrors the reference's Program.Main (reference: client/Program.cs:9-40):
loads the JSON config, runs the copy, exits with the reference's codes
(0 ok, 1 config/connection, 2 mismatch, 3 copy errors).
"""

from __future__ import annotations

import os
import signal
import sys

from smartbulkcopy_spark.executor import EXIT_CONFIG


def install_cancel_handler(
    spark, on_cancel=None, log=print, hard_exit=lambda: os._exit(130)
):
    """Two-stage Ctrl-C, like the reference (client/SmartBulkCopy.cs:
    913-928, 44-45): first press cancels running Spark jobs AND tells the
    executor to skip queued tables (killing in-flight jobs alone would
    let the worker pool keep starting fresh jobs); second press
    hard-exits."""
    state = {"presses": 0}

    def handler(_sig, _frame):
        state["presses"] += 1
        if state["presses"] == 1:
            log("cancel requested — stopping Spark jobs (Ctrl-C again to"
                " force quit)")
            if on_cancel is not None:
                on_cancel()
            spark.sparkContext.cancelAllJobs()
        else:
            hard_exit()

    signal.signal(signal.SIGINT, handler)
    return handler


def _curate_main(argv: list[str]) -> int:
    """``python -m smartbulkcopy_spark curate <sf_dir> <out_dir>`` — run
    the assembled curation pipeline (pipeline/curate.py) and print the
    per-split acceptance stats."""
    if len(argv) != 2:
        print("usage: python -m smartbulkcopy_spark curate <sf_dir> <out>")
        return EXIT_CONFIG
    from smartbulkcopy_spark.pipeline.curate import curate
    from smartbulkcopy_spark.session import get_spark

    spark = get_spark(app_name="smartsparkcopy-curate")
    install_cancel_handler(spark)
    for row in curate(spark, argv[0], argv[1]).collect():
        print(
            f"{row['split']}: {row['n_docs']} docs,"
            f" {row['total_tokens']} tokens"
        )
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "curate":
        return _curate_main(argv[1:])
    if len(argv) != 1:
        print("usage: python -m smartbulkcopy_spark <config.json>"
              " | curate <sf_dir> <out>")
        return EXIT_CONFIG
    from smartbulkcopy_spark.config import load_config
    from smartbulkcopy_spark.executor import CopyExecutor, RunReport
    from smartbulkcopy_spark.session import get_spark

    try:
        config = load_config(argv[0])
    except (ValueError, OSError, KeyError) as exc:
        print(f"config error: {exc}")
        return EXIT_CONFIG
    spark = get_spark(app_name="smartsparkcopy")
    executor = CopyExecutor(spark, config)
    install_cancel_handler(spark, on_cancel=executor.request_cancel)
    report: RunReport = executor.run()
    for m in report.messages:
        print(m)
    return report.exit_code


if __name__ == "__main__":
    sys.exit(main())
