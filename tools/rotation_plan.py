#!/usr/bin/env python
"""Compute the recommended next driver-window rotation mechanically.

The round driver certifies only the FIRST 50 names of
``__spark_entry__.queries()`` each round (CORRECTNESS_r{N}.json), so with
a 407-name registry the window must ROTATE or certifications go stale
(VERDICT r9 "What's missing" #1: 136 names were last driver-checked in
rounds 1-3). This tool reads every CORRECTNESS_r*.json, computes each
name's last-certified round, and prints the recommended next window:

  1. names with NO driver row ever (newest additions), registration order
  2. names whose backing code changed since the given git ref
     (``--diff``, via tools/query_map.py) — changed queries re-certify
     before stale ones
  3. the oldest-certified cohort, oldest round first, alphabetical within
     a round

Usage: python tools/rotation_plan.py [--slots 50] [--diff <git-ref>]
Prints one name per line (the _CHECK_FIRST window head), then a summary
of the staleness histogram to stderr.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _row_green(row: object) -> bool:
    """A driver row certifies a name only if the check actually PASSED.

    err must be null and rows_match/schema_match true; hash_match must be
    true when present (rows-only checks for non-SQL-expressible ops carry
    no hash_match key and count on their weaker rows+schema evidence).
    A failed row must NOT advance last-certified — otherwise a regression
    would be deprioritized for recertification, the opposite of intent.
    """
    if not isinstance(row, dict):
        return True  # pre-r2 artifacts stored bare name lists
    return (
        not row.get("err")
        and bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and bool(row.get("hash_match", True))
    )


def last_certified() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        rows = data.items() if isinstance(data, dict) else ((n, None) for n in data)
        for name, row in rows:
            if _row_green(row):
                out[name] = max(out.get(name, 0), rnd)
    return out


def main(argv: list[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument("--diff", help="git ref: changed queries re-certify first")
    args = ap.parse_args(argv)

    import __spark_entry__ as entry

    names = list(entry.queries())
    cert = last_certified()

    changed: list[str] = []
    if args.diff:
        import subprocess

        from tools.query_map import load_or_build

        manifest = load_or_build()
        touched = subprocess.run(
            ["git", "diff", "--name-only", args.diff, "--", "*.py"],
            capture_output=True, text=True, cwd=REPO, check=True,
        ).stdout.split()
        touched_set = set(touched)
        changed = [
            n for n in names
            if any(f in touched_set for f in manifest.get(n, []))
        ]

    never = [n for n in names if n not in cert]
    chg = [n for n in changed if n in cert]
    stale = sorted(
        (n for n in names if n in cert and n not in set(chg)),
        key=lambda n: (cert[n], n),
    )
    window, seen = [], set()
    for group in (never, chg, stale):
        for n in group:
            if n not in seen:
                seen.add(n)
                window.append(n)
            if len(window) >= args.slots:
                break
        if len(window) >= args.slots:
            break
    for n in window:
        print(n)

    from collections import Counter

    hist = Counter(cert.get(n, 0) for n in names)
    print(
        f"# {len(never)} never-certified, {len(chg)} changed; "
        f"last-certified histogram (0=never): {dict(sorted(hist.items()))}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
