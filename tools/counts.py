#!/usr/bin/env python3
"""Mechanical doc-count sync (rounds 9/10 drift class: README/COVERAGE
claimed stale test/query counts three rounds running).

Usage:
  python3 tools/counts.py <sbt-test-log>          # check, exit 1 on drift
  python3 tools/counts.py <sbt-test-log> --fix    # rewrite the doc lines

<sbt-test-log> is a file holding `sbt -batch test` output; the tool reads
  - "Tests: succeeded N"   -> ScalaTest case count
  - "Passed: Total N"      -> all checks (ScalaTest + ScalaCheck laws)
and counts registered queries as the distinct quoted q-names in
src/main/scala/graft/queries (each QuerySpec name is a unique string
literal there; comments never quote them).

Dev tool only — not part of the shipped Scala library. gate.sh runs it in
check mode after the test gate.
"""
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def sbt_counts(log_text: str):
    tests = re.findall(r"Tests: succeeded (\d+)", log_text)
    total = re.findall(r"Passed: Total (\d+)", log_text)
    if not tests or not total:
        sys.exit("counts.py: log lacks 'Tests: succeeded N' / "
                 "'Passed: Total N' lines — pass a full `sbt test` log")
    n_tests, n_total = int(tests[-1]), int(total[-1])
    return n_total, n_tests, n_total - n_tests


def query_count() -> int:
    names = set()
    for f in (ROOT / "src/main/scala/graft/queries").glob("*.scala"):
        names |= set(re.findall(r'"(q\d+_[A-Za-z0-9_]+)"', f.read_text()))
    return len(names)


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: python3 tools/counts.py <sbt-test-log> [--fix]",
              file=sys.stderr)
        return 2
    try:
        log = Path(sys.argv[1]).read_text()
    except FileNotFoundError:
        print(f"counts.py: no such log file: {sys.argv[1]}", file=sys.stderr)
        return 2
    fix = "--fix" in sys.argv[2:]
    total, tests, laws = sbt_counts(log)
    nq = query_count()

    # (file, pattern, replacement) — every count claim the docs make
    rules = [
        ("README.md",
         r"\d+ checks \(\d+ ScalaTest cases \+ \d+ ScalaCheck laws\)",
         f"{total} checks ({tests} ScalaTest cases + {laws} ScalaCheck laws)"),
        ("README.md",
         r"\d+ checks \(\d+ tests \+ \d+ laws\)",
         f"{total} checks ({tests} tests + {laws} laws)"),
        ("README.md", r"— \d+ pass,", f"— {nq} pass,"),
        ("README.md", r"\(\d+ queries\)", f"({nq} queries)"),
        ("README.md", r"Selection \(\d+; ALL oracle-checked\)",
         f"Selection ({nq}; ALL oracle-checked)"),
        ("COVERAGE.md",
         r"\(\d+ checks green: \d+ tests \+ \d+ laws\)",
         f"({total} checks green: {tests} tests + {laws} laws)"),
        ("COVERAGE.md", r"\*\*\d+ pass / 0 fail", f"**{nq} pass / 0 fail"),
        ("COVERAGE.md", r"all \d+ hash-match", f"all {nq} hash-match"),
    ]
    drifted = []
    for fname, pat, repl in rules:
        p = ROOT / fname
        text = p.read_text()
        if not re.search(pat, text):
            drifted.append(f"{fname}: pattern gone: {pat}")
            continue
        new = re.sub(pat, repl, text)
        if new != text:
            if fix:
                p.write_text(new)
                print(f"counts.py: fixed {fname}: {repl}")
            else:
                drifted.append(f"{fname}: claims drift from '{repl}'")
    print(f"counts.py: measured {total} checks ({tests} tests + {laws} "
          f"laws), {nq} queries")
    if drifted and not fix:
        for d in drifted:
            print("DRIFT:", d)
        return 1
    if drifted:
        for d in drifted:
            print("UNFIXABLE:", d)
        return 1
    print("counts.py: docs in sync" + (" (after fix)" if fix else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
