"""Regenerate tests/slow_tests.txt from a measured-durations run.

Usage:
    python -m pytest tests/ -q --durations=0 > /tmp/durations.txt
    python tests/make_slow_manifest.py /tmp/durations.txt [threshold_s]

Every test whose ``call`` phase exceeded the threshold (default 4 s) is
listed; tests/conftest.py marks listed tests ``slow`` at collection so
``make test`` (quick tier, `-m "not slow"`) stays under ~10 minutes while
``make test-all`` runs everything.
"""

from __future__ import annotations

import pathlib
import re
import sys

THRESHOLD_S = 4.0


def main(argv: list[str]) -> int:
    src = pathlib.Path(argv[1])
    threshold = float(argv[2]) if len(argv) > 2 else THRESHOLD_S
    pat = re.compile(r"^(\d+\.\d+)s call\s+(\S+)")
    ids = []
    for line in src.read_text().splitlines():
        m = pat.match(line)
        if m and float(m.group(1)) > threshold:
            ids.append(m.group(2))
    out = pathlib.Path(__file__).with_name("slow_tests.txt")
    out.write_text("\n".join(sorted(ids)) + "\n")
    print(f"wrote {len(ids)} slow test ids (> {threshold}s) to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
