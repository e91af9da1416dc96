"""xemoclone parity — clone a monitoring-object config tree from a
template with macro substitution.

Reference: xemoclone.c (conf_process, line_process). Recursively copies
``-i SRC_DIR`` to ``-o DST_DIR``. Template semantics, matched exactly:

  * a line containing ``//!tmpl`` is a TEMPLATE line: it is written to
    the output UNCHANGED (so the clone can itself be re-cloned), then
    the mark is stripped and ``${KEY}`` macros are substituted from
    ``-r "A=B[;C=D[;...]]"`` (xemoclone.c:78-85);
  * each macro is substituted at its FIRST occurrence only —
    str_replace (xemoclone.c:51-70) replaces one hit per key, so a line
    repeating ``${KEY}`` keeps the second occurrence, which then trips
    the unresolved-macro check below (warn-and-skip);
  * if every macro resolved, the substituted line is written and the
    NEXT source line (the previous concrete value) is consumed
    (xemoclone.c:142-152);
  * an unresolved ``${...}`` is a WARNING, not an error: the template
    substitution is skipped for that line and the following line is
    kept as-is (xemoclone.c:87-105, 153-157); a ``${`` with no closing
    brace is "WARN: malformed macro", also skipped (xemoclone.c:92-96);
  * ordinary lines are copied verbatim — ``${...}`` outside template
    lines is data, never inspected (conf_process's else branch).

Files are processed as BYTES (line-split on \\n, endings preserved), so
non-UTF-8 content and CRLF files survive the clone byte-identically,
like the reference's fgets/fputs copy.

ONE deliberate deviation: the reference's ``feof()`` check right after
``fgets()`` (xemoclone.c:133-136) silently DROPS a final line that lacks
a trailing newline; this port keeps that line. Reproducing the quirk
would throw away user config data for fidelity to what reads as an
fgets/feof bug, not a template semantic.

Usage: xe_moclone.py -i SRC_DIR -o DST_DIR [-r "A=B;C=D"]
"""

from __future__ import annotations

import argparse
import os
import sys

TEMPLATE_MARK = b"//!tmpl"


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


def line_process(line: bytes, repl: dict[str, str]) -> tuple[bool, bytes]:
    """Strip the mark, substitute macros. Returns (ok, substituted);
    ok=False when a macro stays unresolved or malformed (warned, like
    the reference's WARN + skip). Each key substitutes its FIRST
    occurrence only — str_replace parity (xemoclone.c:51-70): a repeated
    macro leaves the later ``${...}`` in place and the line is skipped
    with the unresolved-macro warning."""
    line = line.replace(TEMPLATE_MARK, b"", 1)
    for k, v in repl.items():
        line = line.replace(b"${" + k.encode() + b"}", v.encode(), 1)
    at = line.find(b"${")
    if at != -1:
        end = line.find(b"}", at + 2)
        if end == -1:
            print("WARN: malformed macro", file=sys.stderr)
            return False, line
        name = line[at + 2:end].decode(errors="replace")
        print(
            f"WARN: macro ${{{name}}} is not in replacements list",
            file=sys.stderr,
        )
        return False, line
    return True, line


def process_lines(lines: list[bytes], repl: dict[str, str],
                  fname: str = "?") -> list[bytes]:
    out: list[bytes] = []
    i = 0
    while i < len(lines):
        line = lines[i]
        i += 1
        if TEMPLATE_MARK in line:
            out.append(line)              # template line survives verbatim
            ok, sub = line_process(line, repl)
            if ok:
                out.append(sub)
                if i < len(lines):
                    i += 1                # consume the stale value line
            else:
                print(
                    f"WARN: file {fname!r}, line {i}, skipping template",
                    file=sys.stderr,
                )
        else:
            out.append(line)
    return out


def clone(src: str, dst: str, repl: dict[str, str]) -> list[str]:
    written = []
    for dirpath, _dirnames, filenames in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        out_dir = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out_dir, exist_ok=True)
        for fname in filenames:
            in_path = os.path.join(dirpath, fname)
            out_path = os.path.join(out_dir, fname)
            with open(in_path, "rb") as fi:
                lines = fi.read().splitlines(keepends=True)
            with open(out_path, "wb") as fo:
                fo.write(b"".join(process_lines(lines, repl, in_path)))
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
