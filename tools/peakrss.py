#!/usr/bin/env python
"""Minimal `/usr/bin/time -v` stand-in: run a command, report elapsed
wall-clock and the children's peak RSS in the same phrasing GNU time
uses, so existing `grep -E "Maximum resident|Elapsed"` consumers work
on hosts (like this VM) that don't ship the binary.

Usage: python tools/peakrss.py -- <command> [args...]
"""

from __future__ import annotations

import resource
import subprocess
import sys
import time


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--":
        argv = argv[1:]
    if not argv:
        print("usage: peakrss.py -- <command> [args...]", file=sys.stderr)
        return 2
    t0 = time.time()
    rc = subprocess.call(argv)
    dt = time.time() - t0
    # ru_maxrss is KiB on Linux (matches GNU time's unit).
    peak = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
    print(f"\tElapsed (wall clock) time (h:mm:ss or m:ss): "
          f"{int(dt // 3600)}:{int(dt % 3600 // 60):02d}:{dt % 60:05.2f}",
          file=sys.stderr)
    print(f"\tMaximum resident set size (kbytes): {peak}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
