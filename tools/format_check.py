#!/usr/bin/env python3
"""Source-format enforcement (the reference's format_script.sh equivalent,
/root/reference/format_script.sh — clang-format there, a self-contained
checker here since no formatter package is baked into this image).

Rules: no tabs, no trailing whitespace, LF endings, newline at EOF,
no merge-conflict markers.  Run: python tools/format_check.py [--fix]
Exit 0 = clean.  Wired into the test suite (tests/test_aux.py).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHECKED = ("cmacionize_tpu", "tests", "benchmarks", "tools")
MARKERS = ("<" * 7, "=" * 7 + " ", ">" * 7)


def check_file(path, fix=False):
    with open(path, "rb") as fh:
        raw = fh.read()
    problems = []
    if b"\r\n" in raw:
        problems.append("CRLF line endings")
    text = raw.decode("utf-8", errors="replace")
    lines = text.split("\n")
    for i, line in enumerate(lines, 1):
        if "\t" in line and not path.endswith((".sh", ".param", ".txt")):
            problems.append(f"tab character at line {i}")
            break
    for i, line in enumerate(lines, 1):
        if line != line.rstrip():
            problems.append(f"trailing whitespace at line {i}")
            break
    for marker in MARKERS:
        if any(line.startswith(marker) for line in lines):
            problems.append("merge-conflict marker")
    if raw and not raw.endswith(b"\n"):
        problems.append("missing newline at EOF")
    if fix and problems:
        fixed = "\n".join(line.rstrip() for line in text.split("\n"))
        if not fixed.endswith("\n"):
            fixed += "\n"
        with open(path, "w", newline="\n") as fh:
            fh.write(fixed)
    return problems


def main(argv):
    fix = "--fix" in argv
    bad = 0
    for top in CHECKED:
        for root, dirs, files in os.walk(os.path.join(REPO, top)):
            dirs[:] = [d for d in dirs if d not in ("__pycache__",)]
            for name in sorted(files):
                if not name.endswith((".py", ".cpp", ".h", ".sh")):
                    continue
                path = os.path.join(root, name)
                problems = check_file(path, fix=fix)
                if problems:
                    bad += 1
                    rel = os.path.relpath(path, REPO)
                    print(f"{rel}: " + "; ".join(problems))
    if bad:
        print(f"{bad} file(s) violate formatting"
              + (" (fixed)" if fix else " — run with --fix"))
        return 0 if fix else 1
    print("format OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
