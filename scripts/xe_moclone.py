"""xemoclone parity — clone a monitoring-object config tree from a
template with macro substitution.

Reference: xemoclone.c. Recursively copies ``-i SRC_DIR`` to
``-o DST_DIR``; every line of every file is processed
(xemoclone.c:73-108):

  * the literal template mark ``//!tmpl`` is stripped (first occurrence
    per line, xemoclone.c:30 + :78);
  * ``${KEY}`` macros are replaced from ``-r "A=B[;C=D[;...]]"``
    (xemoclone.c:80-85);
  * a remaining ``${...}`` after substitution is an error — a macro
    missing from the replacement list (xemoclone.c:87-104).

Usage: xe_moclone.py -i SRC_DIR -o DST_DIR [-r "A=B;C=D"]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

TEMPLATE_MARK = "//!tmpl"
_MACRO = re.compile(r"\$\{([^}]*)\}")


def parse_replacements(spec: str | None) -> dict[str, str]:
    out: dict[str, str] = {}
    if not spec:
        return out
    for pair in spec.split(";"):
        pair = pair.strip()
        if not pair:
            continue
        if "=" not in pair:
            raise SystemExit(f"malformed replacement {pair!r} (need A=B)")
        k, v = pair.split("=", 1)
        out[k] = v
    return out


def process_line(line: str, repl: dict[str, str]) -> str:
    line = line.replace(TEMPLATE_MARK, "", 1)
    for k, v in repl.items():
        line = line.replace("${" + k + "}", v)
    m = _MACRO.search(line)
    if m:
        raise SystemExit(
            f"macro ${{{m.group(1)}}} is not in the replacements list"
        )
    return line


def clone(src: str, dst: str, repl: dict[str, str]) -> list[str]:
    written = []
    for dirpath, _dirnames, filenames in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        out_dir = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out_dir, exist_ok=True)
        for fname in filenames:
            in_path = os.path.join(dirpath, fname)
            out_path = os.path.join(out_dir, fname)
            with open(in_path, encoding="utf-8", errors="replace") as fi, \
                    open(out_path, "w", encoding="utf-8") as fo:
                for line in fi:
                    fo.write(process_line(line, repl))
            written.append(out_path)
    return written


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="xe_moclone")
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-r", "--replace", default=None,
                    help='"A=B[;C=D[;...]]"')
    args = ap.parse_args(argv)
    if not os.path.isdir(args.input):
        raise SystemExit(f"input dir {args.input!r} does not exist")
    written = clone(args.input, args.output, parse_replacements(args.replace))
    print(f"{len(written)} files written", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
