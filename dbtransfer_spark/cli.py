"""CLI — flag parity with the reference's main (main.go:217-224).

``python -m dbtransfer_spark.cli -config cfg.yaml [-type mysql]
[-generate-template] [-template-output out.yaml] [-version]``

Engine dispatch (main.go:277-291): explicit ``-type`` wins, else
``source.type`` from config, else port-sniffing auto-detect
(main.go:342-363: 27017→mongodb, 9042→cassandra, 5432→postgresql,
else mysql).
"""

from __future__ import annotations

import argparse
import json
import signal
import sys

from dbtransfer_spark import __version__
from dbtransfer_spark.config import generate_template, load_config
from dbtransfer_spark.engine import TransferEngine
from dbtransfer_spark.session import get_spark


def autodetect_type(hosts: list[str]) -> str:
    """Port-sniffing engine detection (main.go:349-362)."""
    for host in hosts:
        port = host.rsplit(":", 1)[-1] if ":" in host else ""
        if port == "27017":
            return "mongodb"
        if port == "9042":
            return "cassandra"
        if port == "5432":
            return "postgresql"
    return "mysql"


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="dbtransfer-spark")
    parser.add_argument("-config", "--config", default="config.yaml")
    parser.add_argument("-type", "--type", dest="engine_type", default="")
    parser.add_argument("-generate-template", "--generate-template", action="store_true")
    parser.add_argument("-template-output", "--template-output", default="config-template.yaml")
    parser.add_argument("-version", "--version", action="store_true")
    parser.add_argument("--chunk-rows", type=int, default=0, help="checkpoint granularity (rows per chunk); 0 = single-shot")
    args = parser.parse_args(argv)

    if args.version:
        print(f"dbtransfer-spark {__version__}")
        return 0
    if args.generate_template:
        # -type selects the engine-specific template (main.go:60-213).
        generate_template(args.template_output, args.engine_type or "parquet")
        print(f"template written to {args.template_output}")
        return 0

    cfg = load_config(args.config)
    if args.engine_type:
        cfg.source.type = args.engine_type
    elif not cfg.source.type:
        cfg.source.type = autodetect_type(cfg.source.hosts)

    spark = get_spark()
    engine = TransferEngine(spark, cfg, chunk_rows=args.chunk_rows or None)

    def _handle(sig: int, frame: object) -> None:  # main.go:298-308
        print("interrupt: finishing current chunk and checkpointing...", file=sys.stderr)
        engine.shutdown()

    signal.signal(signal.SIGINT, _handle)
    signal.signal(signal.SIGTERM, _handle)

    results = engine.run()
    print(json.dumps({"tables": results, "stats": engine.stats.snapshot()}, default=str))
    return 1 if any(isinstance(r, dict) and "error" in r for r in results.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
