#!/usr/bin/env python
"""Contract-query -> backing-source-file manifest (VERDICT r7 item 6).

With 317 registered queries and a 50-slot driver correctness window, a
changed operator's queries could go many rounds unre-certified. This tool
makes the "which queries did this round's diff touch?" question mechanical:

  python tools/query_map.py                 # write tools/query_map.json
  python tools/query_map.py --affected A.py B.py
                                            # queries backed by those files
  python tools/query_map.py --diff HEAD~5   # queries touched since a ref

The manifest maps every registry query name to the repo .py files that back
it: the contract_ext module defining it plus every gridmet_etl_spark module
its builder function (transitively, one level) imports. Resolution is
static — `inspect.getsource` on the query callable, scanning
`from .operators.x import` / `from .plans.x import` / `from gridmet_etl_spark...`
forms — so the map regenerates in seconds without running Spark.

Round protocol: front-load _CHECK_FIRST in __spark_entry__.py with
`--diff <last-round-tag>` output (queries whose backing code changed),
then new queries, then backlog/rotation.
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "gridmet_etl_spark"

_IMPORT_RE = re.compile(
    r"^\s*from\s+(?:gridmet_etl_spark)?(\.[\w.]+|\.)?\s*import\s+(.+)$|"
    r"^\s*from\s+gridmet_etl_spark\.([\w.]+)\s+import\s+(.+)$",
    re.M,
)


def _module_file(mod: str) -> str | None:
    """gridmet_etl_spark-relative module dotted path -> repo-relative file."""
    path = os.path.join(PKG, *mod.split(".")) + ".py"
    return path if os.path.exists(os.path.join(REPO, path)) else None


def _imports_of_source(src: str) -> set[str]:
    """Repo-relative files imported by a source blob (one level)."""
    out: set[str] = set()
    for m in re.finditer(
        r"^\s*from\s+(?:gridmet_etl_spark)?((?:\.|\w)[\w.]*)\s+import\s", src, re.M
    ):
        mod = m.group(1).lstrip(".")
        if not mod:
            continue
        f = _module_file(mod)
        if f:
            out.add(f)
    return out


def build_manifest() -> dict[str, list[str]]:
    import __spark_entry__ as entry_mod

    manifest: dict[str, list[str]] = {}
    for name, fn in entry_mod.queries().items():
        files: set[str] = set()
        # the defining contract module
        mod = sys.modules.get(fn.__module__)
        if mod is not None and getattr(mod, "__file__", None):
            files.add(os.path.relpath(mod.__file__, REPO))
        # modules the builder function imports in its body
        try:
            src = inspect.getsource(fn)
        except OSError:
            src = ""
        direct = _imports_of_source(src)
        files |= direct
        # one transitive level: operator modules' own intra-package imports
        for f in list(direct):
            try:
                with open(os.path.join(REPO, f)) as fh:
                    files |= _imports_of_source(fh.read())
            except OSError:
                pass
        manifest[name] = sorted(files)
    return manifest


def load_or_build() -> dict[str, list[str]]:
    path = os.path.join(REPO, "tools", "query_map.json")
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    return build_manifest()


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--affected", nargs="*", help="repo-relative .py files")
    ap.add_argument("--diff", help="git ref: queries touched since this ref")
    args = ap.parse_args(argv)

    if args.diff:
        changed = subprocess.run(
            ["git", "diff", "--name-only", args.diff, "HEAD"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
        changed = [f for f in changed if f.endswith(".py")]
        args.affected = changed

    manifest = build_manifest()
    out_path = os.path.join(REPO, "tools", "query_map.json")
    with open(out_path, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)

    if args.affected is not None:
        touched = set(args.affected)
        hits = sorted(
            name for name, files in manifest.items() if touched & set(files)
        )
        print("\n".join(hits))
        print(f"# {len(hits)} queries backed by {len(touched)} changed files",
              file=sys.stderr)
    else:
        n_files = len({f for fs in manifest.values() for f in fs})
        print(f"wrote {out_path}: {len(manifest)} queries over {n_files} files")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
