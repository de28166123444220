"""CLI — the reference's command surface (/root/reference/bin.js,
help.txt): run / pipe / exec / add / rm / ls / show / version / help.

Text-mode semantics: ``run`` executes pipelines sequentially and
prints their line output (bin.js:132-155); ``pipe`` chains
stdin → pipeline₁ → … → pipelineₙ → stdout (bin.js:157-184 —
cross-pipeline composition, the reduce-chain at bin.js:176-178);
``exec`` is the ad-hoc escape hatch (bin.js:79-84). Config CRUD
persists to gasket.json or package.json's "gasket" key (bin.js:26-46).
"""

from __future__ import annotations

import argparse
import sys

from gasket_spark import __version__

HELP = """\
gasket-spark <command> [pipelines...]

  run   [pipes...]   run pipelines sequentially, print output (default: main)
  pipe  [pipes...]   chain stdin -> pipeline1 -> ... -> pipelineN -> stdout
  exec  <script>     pipe stdin through an ad-hoc command
  add   <pipe> <cmd> append a command stage to a pipeline
  rm    <pipe>       remove a pipeline
  ls                 list pipeline names
  show  <pipe>       pretty-print a pipeline as `a | b` lines
  version            print version
  completion         print a bash tab-completion script (eval or source it)
  help               this text

  -c, --config <path>  explicit config file (default: ./gasket.json,
                       then ./package.json "gasket" key)
  -p, --param  <v>     extra param appended to command stages (repeatable)
"""


_COMPLETION = """\
_gasket_spark_complete() {
  local cur prev cmds
  cur="${COMP_WORDS[COMP_CWORD]}"
  cmds="run pipe exec add rm ls show version completion help"
  if [ "$COMP_CWORD" -eq 1 ]; then
    COMPREPLY=( $(compgen -W "$cmds" -- "$cur") )
  else
    case "${COMP_WORDS[1]}" in
      run|pipe|rm|show)
        COMPREPLY=( $(compgen -W "$(gasket-spark ls 2>/dev/null)" -- "$cur") ) ;;
      *) COMPREPLY=() ;;
    esac
  fi
}
complete -F _gasket_spark_complete gasket-spark
"""


def _load_engine(args, create: bool = False):
    from gasket_spark.pipeline.engine import Engine, load

    try:
        return load(args.config or ".")
    except FileNotFoundError:
        if not create:
            raise
        # `add` into a fresh directory bootstraps a new gasket.json
        eng = Engine({})
        eng.config_path = args.config or "gasket.json"
        return eng


def _stdin_df(spark):
    lines = [ln.rstrip("\n") for ln in sys.stdin]
    # size partitions to the data: command stages spawn one child per
    # partition, so a 3-line stdin shouldn't fork 32 processes
    slices = max(1, min(len(lines) // 10_000 + 1, 32))
    rdd = spark.sparkContext.parallelize([(v,) for v in lines], slices)
    return spark.createDataFrame(rdd, "value string")


def _print_df(df) -> None:
    # Stream partitions through the driver instead of materialising the
    # whole result (`collect()`) — a large pipeline output must not OOM
    # the CLI process.
    for row in df.toLocalIterator():
        print(row[0] if len(row) == 1 else "\t".join(str(v) for v in row))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="gasket-spark", add_help=False)
    parser.add_argument("command", nargs="?", default="help")
    parser.add_argument("args", nargs="*")
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument("-p", "--param", action="append", default=[])
    ns, unknown = parser.parse_known_args(argv)

    cmd, rest = ns.command, ns.args + unknown  # unknown flags (e.g. `wc -l`)
    # belong to the stage command text, not to this CLI
    if cmd in ("help", None) or cmd == "--help":
        print(HELP)
        return 0
    if cmd == "version":
        print(__version__)
        return 0
    if cmd == "completion":
        # tab-completion affordance, as the reference's tabalot-based
        # `completion` (bin.js:57-67): subcommands complete statically,
        # pipeline-name positions complete from the live config via `ls`
        print(_COMPLETION)
        return 0

    try:
        if cmd == "ls":
            for name in _load_engine(ns).list():
                print(name)
            return 0
        if cmd == "show":
            eng = _load_engine(ns)
            for name in (rest or eng.list()):
                cfg = eng.to_json().get(name, [])
                print(f"{name}:")
                # `a | b` rendering, as the reference's show (bin.js:105-120)
                from gasket_spark.pipeline.spec import normalize_stage
                parts = []
                for raw in cfg:
                    st = normalize_stage(raw)
                    parts.append(st.command if st.kind == "command"
                                 else str(st.module))
                print("  " + " | ".join(parts))
            return 0
        if cmd == "add":
            if len(rest) < 2:
                print("usage: gasket-spark add <pipe> <command>", file=sys.stderr)
                return 2
            eng = _load_engine(ns, create=True)
            eng.add(rest[0], " ".join(rest[1:]))
            eng.save()
            return 0
        if cmd == "rm":
            eng = _load_engine(ns)
            eng.rm(rest[0])
            eng.save()
            return 0

        # execution verbs need a session
        from gasket_spark.session import get_spark
        spark = get_spark("gasket-cli")
        spark.sparkContext.setLogLevel("ERROR")

        if cmd == "exec":
            if not rest:
                print("usage: gasket-spark exec '<script>'", file=sys.stderr)
                return 2
            from gasket_spark.pipeline.engine import Engine
            df = Engine(spark=spark).exec(
                " ".join(rest), params=ns.param,
                input_df=None if sys.stdin.isatty() else _stdin_df(spark))
            _print_df(df)
            return 0
        if cmd == "run":
            eng = _load_engine(ns)
            names = rest or ["main"]
            for name in names:
                if not eng.has(name):
                    # missing names warn, except the default `main`
                    # (bin.js:140-145)
                    if name != "main":
                        print(f"warning: no pipeline named {name!r}",
                              file=sys.stderr)
                    continue
                _print_df(eng.run(name, params=ns.param))
            return 0
        if cmd == "pipe":
            eng = _load_engine(ns)
            df = None if sys.stdin.isatty() else _stdin_df(spark)
            for name in rest or ["main"]:
                df = eng.pipe(name, input_df=df, params=ns.param)
            if df is not None:
                _print_df(df)
            return 0
    except Exception as exc:  # noqa: BLE001 - CLI boundary
        print(f"error: {exc}", file=sys.stderr)
        return 2  # exit code 2 on error, as the reference (bin.js:21-24)

    print(HELP)
    return 2


if __name__ == "__main__":
    sys.exit(main())
