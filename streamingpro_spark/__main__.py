"""CLI: run a script file or start the REST server.

    python -m streamingpro_spark script.mlsql [--master local[*]]
    python -m streamingpro_spark --serve [--port 9003] [--host 0.0.0.0]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="streamingpro_spark")
    ap.add_argument("script", nargs="?", help="MLSQL script file (or - for stdin)")
    ap.add_argument("--serve", action="store_true", help="start the REST server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9003)
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--owner", default="admin")
    ap.add_argument("--show", type=int, default=20,
                    help="rows of the final table to print (batch mode)")
    ap.add_argument("--selftest", action="store_true",
                    help="run a built-in end-to-end smoke and exit")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(args.master)
             .appName("streamingpro_spark")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    if args.selftest:
        from streamingpro_spark import Engine
        df = Engine(spark).execute("""
        set data = '''{"k":"a","v":1}\n{"k":"b","v":2}''';
        load jsonStr.`data` as t;
        select k, v * 2 as v2 from t as out;
        """)
        rows = sorted((r["k"], r["v2"]) for r in df.collect())
        ok = rows == [("a", 2), ("b", 4)]
        print("selftest:", "OK" if ok else f"FAIL {rows}")
        return 0 if ok else 1

    if args.serve:
        from streamingpro_spark.server import MLSQLServer
        srv = MLSQLServer(spark, host=args.host, port=args.port).start()
        print(f"streamingpro_spark REST server on http://{args.host}:{srv.port}")
        try:
            srv._thread.join()
        except KeyboardInterrupt:
            srv.stop()
        return 0

    if not args.script:
        ap.error("either a script file or --serve is required")
    text = (sys.stdin.read() if args.script == "-"
            else open(args.script, encoding="utf-8").read())
    from streamingpro_spark import Engine
    df = Engine(spark, owner=args.owner).execute(text)
    if df is not None:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
