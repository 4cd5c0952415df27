"""Command-line surface.

Mirrors the reference CLI (SURVEY.md §2.5; cli/commands/generate/
generate.go:37-174): ``generate [--force] [--continue-generation] PATH``,
``validate-config PATH``, ``generate-config {description,sql-query,
data-sample}``, ``serve``, ``version``.
"""

from __future__ import annotations

import argparse
import json
import sys

from sdvg_spark import __version__


def _load_raw(path: str) -> dict:
    from sdvg_spark.config.model import load_raw_config

    return load_raw_config(path)


def cmd_generate(args: argparse.Namespace) -> int:
    from sdvg_spark.backup import ConflictError
    from sdvg_spark.jobs import run_generate

    raw = _load_raw(args.config)

    def progress(model: str, frac: float) -> None:
        print(f"[{model}] {frac * 100:5.1f}%", file=sys.stderr)

    try:
        written = run_generate(
            raw,
            force=args.force,
            continue_generation=args.continue_generation,
            on_progress=progress,
        )
    except ConflictError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    for model, path in written.items():
        print(f"{model}: {path}")
    return 0


def cmd_validate(args: argparse.Namespace) -> int:
    from sdvg_spark.config.model import ConfigError

    try:
        from sdvg_spark.config.model import parse_config

        parse_config(_load_raw(args.config))
    except ConfigError as e:
        print(f"invalid: {e}", file=sys.stderr)
        return 1
    print("ok")
    return 0


def cmd_generate_config(args: argparse.Namespace) -> int:
    from sdvg_spark import config_synth

    if args.mode == "sql-query":
        raw = config_synth.ddl_to_config(open(args.input, encoding="utf-8").read())
    elif args.mode == "data-sample":
        raw = config_synth.sample_to_config(open(args.input, encoding="utf-8").read())
    else:  # description
        raw = config_synth.describe_to_config(open(args.input, encoding="utf-8").read())
    out = json.dumps(raw, indent=2, default=str)
    if args.output:
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(out + "\n")
        print(f"wrote {args.output}")
    else:
        print(out)
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    from sdvg_spark.server import serve

    serve(host=args.host, port=args.port, output_root=args.output_dir)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sdvg-spark")
    sub = p.add_subparsers(dest="command", required=True)

    g = sub.add_parser("generate", help="generate data from a config")
    g.add_argument("config")
    g.add_argument("--force", action="store_true", help="clean conflicting outputs")
    g.add_argument(
        "--continue-generation",
        action="store_true",
        help="resume an interrupted run (config must be unchanged)",
    )
    g.set_defaults(fn=cmd_generate)

    v = sub.add_parser("validate-config", help="validate a config file")
    v.add_argument("config")
    v.set_defaults(fn=cmd_validate)

    gc = sub.add_parser("generate-config", help="synthesize a generation config")
    gc.add_argument("mode", choices=["description", "sql-query", "data-sample"])
    gc.add_argument("input", help="input file (text / SQL DDL / CSV sample)")
    gc.add_argument("-o", "--output", default="")
    gc.set_defaults(fn=cmd_generate_config)

    s = sub.add_parser("serve", help="run the HTTP API")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--output-dir", default="output")
    s.set_defaults(fn=cmd_serve)

    ver = sub.add_parser("version")
    ver.set_defaults(fn=lambda a: (print(__version__), 0)[1])
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
