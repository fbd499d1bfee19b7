"""Command-line driver ⇔ bin/parse-syslog-line.pl.

The reference CLI reads stdin line-by-line, applies the config-global
flags, and renders each parsed record (json / pretty / data-dumper /
yaml).  Mapping here:

* `--stdin` mode: single-process loop over stdin through the same
  parser core — no Spark startup, for interactive use (⇔ the
  reference's while(<>) loop, parse-syslog-line.pl:96-106);
* file mode: a Spark job — spark.read.text → the vectorized parse UDF
  → json/parquet sink (the distributed form of the same pipeline).
  Without --output the records stream to stdout via toLocalIterator —
  fine interactively, but at scale ALWAYS pass --output: the iterator
  funnels every partition through the driver one at a time.

Flags mirror the reference's (parse-syslog-line.pl:29-51).
"""

from __future__ import annotations

import argparse
import json
import sys

from .goldens import canon
from .options import ParserOptions


def build_options(args) -> ParserOptions:
    return ParserOptions(
        date_parsing=not args.no_dates,
        epoch_create=True,
        extract_program=not args.no_program,
        auto_detect_json=args.json_detect,
        auto_detect_key_values=args.kv_detect,
        prune_raw=args.prune_raw,
        prune_empty=args.prune_empty,
        prune_fields=tuple(args.prune_field or ()),
        rfc5424_strict=args.strict_sdata,
        default_tz=args.tz,
        now_epoch=args.now,
    )


def _ddp(v, indent: int = 0) -> str:
    """Data::Printer-style hash dump (⇔ the reference CLI's default
    `print|ddp` format, parse-syslog-line.pl:15-17,33): aligned keys,
    nested braces, quoted strings.  Structure-equivalent, not
    byte-identical — Data::Printer's ANSI colors/addresses are
    terminal decoration, not data."""
    pad = "    " * indent
    if isinstance(v, dict):
        if not v:
            return "{}"
        w = max(len(str(k)) for k in v)
        inner = "".join(
            f"{pad}    {k:<{w}}   {_ddp(v[k], indent + 1)},\n" for k in sorted(v)
        )
        return "{\n" + inner + pad + "}"
    if isinstance(v, (list, tuple)):
        inner = "".join(f"{pad}    [{i}] {_ddp(x, indent + 1)},\n"
                        for i, x in enumerate(v))
        return "[\n" + inner + pad + "]"
    if v is None:
        return "undef"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    # escape backslashes / embedded quotes / control chars (⇔
    # Data::Printer's print_escapes) — a bare f'"{v}"' would emit an
    # ambiguous dump for content containing '"'
    return json.dumps(str(v), ensure_ascii=False)


def _render(msg: dict, fmt: str) -> str:
    c = canon(msg)
    if fmt == "json":
        return json.dumps(c, sort_keys=True, ensure_ascii=False)
    if fmt == "pretty":
        return json.dumps(c, sort_keys=True, ensure_ascii=False, indent=2)
    if fmt in ("print", "ddp"):
        return _ddp(c)
    # minimal yaml-ish rendering without external deps
    lines = []
    for k in sorted(c):
        lines.append(f"{k}: {json.dumps(c[k], ensure_ascii=False)}")
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pysyslog", description=__doc__)
    ap.add_argument("input", nargs="?", help="text file/dir (Spark mode); omit for --stdin")
    ap.add_argument("--stdin", action="store_true", help="read lines from stdin (no Spark)")
    ap.add_argument("--output", help="output dir for Spark mode (default: stdout json)")
    ap.add_argument("--format", choices=["json", "pretty", "yaml", "print", "ddp"],
                    default="json")
    ap.add_argument("--json-detect", action="store_true", help="⇔ AutoDetectJSON")
    ap.add_argument("--kv-detect", action="store_true", help="⇔ AutoDetectKeyValues")
    ap.add_argument("--strict-sdata", action="store_true", help="⇔ RFC5424StructuredDataStrict")
    ap.add_argument("--no-dates", action="store_true", help="⇔ DateParsing=0")
    ap.add_argument("--no-program", action="store_true", help="⇔ ExtractProgram=0")
    ap.add_argument("--prune-raw", action="store_true")
    ap.add_argument("--prune-empty", action="store_true")
    ap.add_argument("--prune-field", action="append")
    ap.add_argument("--tz", default="UTC")
    ap.add_argument("--now", type=float, default=None,
                    help="pin 'now' epoch (required for Spark mode determinism)")
    args = ap.parse_args(argv)

    opts = build_options(args)

    if args.stdin or not args.input:
        from .parser_core import SyslogParser

        parser = SyslogParser(opts)
        for line in sys.stdin:
            print(_render(parser.parse(line.rstrip("\n")), args.format))
        return 0

    from pyspark.sql import SparkSession

    from .parser import parse_syslog

    if opts.now_epoch is None:
        import time

        opts = opts.with_(now_epoch=time.time())
    spark = SparkSession.builder.appName("pysyslog-cli").getOrCreate()
    df = spark.read.text(args.input).withColumnRenamed("value", "raw")
    parsed = parse_syslog(df, "raw", opts, emit_parsed_json=True)
    if args.output:
        parsed.select("parsed_json").write.mode("overwrite").text(args.output)
    else:
        for row in parsed.select("parsed_json").toLocalIterator():
            print(row["parsed_json"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
