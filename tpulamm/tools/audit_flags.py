"""Scripted FLAGS.md audit: every flag a **yes** row claims must exist.

Round-2 review found one false row (`--p-split` claimed before it was
implemented). This tool makes the audit mechanical: it parses FLAGS.md,
extracts every backticked CLI flag from rows whose status is `yes`, and
greps the tpulamm source tree for a matching `add_argument` (or literal
flag string). Run standalone or via tests/test_flags_audit.py:

    python -m tpulamm.tools.audit_flags [--flags FLAGS.md]

Exit code 1 + a report if any claimed flag has no implementation.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

# flags whose implementation is not an argparse string (documented
# equivalents; each maps to the substring that must exist somewhere)
EQUIVALENTS = {
    "--rope-freq-base": "rope.freq_base",
    "--rope-freq-scale": "rope.freq_scale",
    "--yarn-ext-factor": "yarn",
    "--rope-scaling": "rope.scaling.type",
    "--logits-file": "--save-logits",
    "-dt": "_defrag",
    "-ts": "--tp",
    "-sm": "--tp",
    "-mg": "--tp",
}

SPAN_RE = re.compile(r"`([^`]+)`")
FLAG_RE = re.compile(r"(?:^|[\s/])(-{1,2}[A-Za-z][A-Za-z0-9-]*)")


def claimed_flags(location_col: str) -> list[str]:
    """Flags inside ANY backtick span of the location column (the round-2
    false row was `cli/speculative.py --p-split` — a flag embedded in a
    path span, which a bare `--flag` regex misses)."""
    out = []
    for span in SPAN_RE.findall(location_col):
        out.extend(FLAG_RE.findall(span))
    return out


def _source_blob(root: str) -> str:
    chunks = []
    for dirpath, _dirs, files in os.walk(os.path.join(root, "tpulamm")):
        for f in files:
            if f.endswith(".py") and f != "audit_flags.py":
                with open(os.path.join(dirpath, f), encoding="utf-8") as fh:
                    chunks.append(fh.read())
    return "\n".join(chunks)


def audit(flags_path: str, root: str | None = None) -> list[str]:
    """Return a list of violation strings (empty = clean)."""
    root = root or os.path.dirname(os.path.abspath(flags_path))
    blob = _source_blob(root)
    problems = []
    with open(flags_path, encoding="utf-8") as fh:
        for lineno, line in enumerate(fh, 1):
            if not line.startswith("|") or line.startswith("|---"):
                continue
            cols = [c.strip() for c in line.strip().strip("|").split("|")]
            if len(cols) < 4 or cols[2].split()[0] not in ("**yes**", "yes"):
                continue
            # flags claimed in the "tpulamm location" column are the
            # implementation claims; the reference-flag column is not
            claimed = claimed_flags(cols[3])
            for flag in claimed:
                if flag in EQUIVALENTS:
                    # documented non-argparse equivalent: bare substring
                    hit = EQUIVALENTS[flag] in blob
                else:
                    # argparse flags must appear as quoted strings — a
                    # mention in prose/docstrings is not an implementation
                    hit = f'"{flag}"' in blob or f"'{flag}'" in blob
                if not hit:
                    needle = EQUIVALENTS.get(flag, flag)
                    problems.append(
                        f"FLAGS.md:{lineno}: claims `{flag}` "
                        f"(searched for {needle!r}) — not found in tpulamm/")
    return problems


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpulamm-audit-flags")
    p.add_argument("--flags", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "FLAGS.md"))
    args = p.parse_args(argv)
    problems = audit(args.flags)
    for prob in problems:
        print(prob, file=sys.stderr)
    if not problems:
        print(f"FLAGS.md audit clean ({args.flags})")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
