#!/usr/bin/env python3
"""Generate the round-certification block FROM the measured artifacts.

Round-13 lesson (VERDICT r13 item 2): hand-written cert figures drifted
from the artifacts they certified (claimed 448 specs / 426.6 s where the
artifacts said 434 / 438.6). This script reads the real outputs and
prints the cert markdown, so the numbers in NOTES.md are the numbers.

Usage:
  python3 tools/make_cert.py <sbt_test_log> <oracle_check_log> [bench_json]

- <sbt_test_log>: a file holding `sbt test` output; parsed for the final
  ScalaTest "Tests: succeeded N, failed N, ..." summary line.
- <oracle_check_log>: output of tools/check_oracle.py; parsed for
  per-query "<name>: OK|FAIL|NO-ORACLE" lines.
- [bench_json]: BENCH_LOCAL.json (default) — total seconds + query count.

Exits 1 (and says so in the block) if any gate is red, so a cert of a
red state cannot be pasted by accident.
"""
import json
import re
import sys


def main():
    test_log, oracle_log = sys.argv[1], sys.argv[2]
    bench_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_LOCAL.json"

    txt = open(test_log, errors="replace").read()
    m = None
    for m in re.finditer(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), ignored (\d+)", txt
    ):
        pass
    if not m:
        sys.exit(f"no ScalaTest summary line in {test_log}")
    succeeded, failed, canceled, ignored = map(int, m.groups())

    ok, bad, noracle = [], [], []
    for line in open(oracle_log, errors="replace"):
        lm = re.match(r"^([a-z0-9_]+): (OK|FAIL|NO-ORACLE|MISSING-OUTPUT)", line)
        if not lm:
            continue
        name, st = lm.groups()
        (ok if st == "OK" else noracle if st == "NO-ORACLE" else bad).append(name)

    bench = json.load(open(bench_path))
    bench_total = bench["value"]
    bench_n = len(bench["queries"])

    # canceled = ScalaTest assume() skips (opt-in harness specs); sbt
    # itself treats them as passing, so they don't redden the cert —
    # they ARE surfaced in the printed line for the reader
    green = failed == 0 and not bad
    print(f"- {len(ok) + len(bad)} queries oracle-checked at sf0.01: "
          f"{len(ok)} hash-green, {len(bad)} red"
          + (f" ({', '.join(bad)})" if bad else "")
          + (f", {len(noracle)} no-oracle ({', '.join(noracle)})" if noracle else
             ", zero no_oracle rows") + ".")
    print(f"- sbt test: {succeeded}/{succeeded + failed} green"
          + (f" ({failed} FAILED)" if failed else "")
          + (f", {canceled} canceled" if canceled else "")
          + (f", {ignored} ignored" if ignored else "") + ".")
    print(f"- {bench_path}: {bench_total:.1f} s over {bench_n} queries at sf0.1 "
          f"local[32] ({bench_total / max(bench_n, 1):.2f} s/query).")
    if not green:
        print("- **GATES RED — do not certify this state.**")
        sys.exit(1)


if __name__ == "__main__":
    main()
