"""Offline config-robustness matrix: run EVERY declared query's
differential under each deployment-config override, one subprocess per
axis (session-global confs cannot be safely flipped mid-suite).

    python scripts/config_matrix.py            # all axes at sf0.01
    python scripts/config_matrix.py aqe tz     # chosen axes

Backs the README claim that results never ride on a tuning knob; the
per-axis SENSITIVE subsets stay pinned in tests/test_scale.py — this
script is the periodic full-width sweep (re-run whenever the declared
surface grows)."""

from __future__ import annotations

import subprocess
import sys

AXES = {
    "aqe": {"spark.sql.adaptive.enabled": "false"},
    "ansi": {"spark.sql.ansi.enabled": "false"},
    "codegen": {"spark.sql.codegen.wholeStage": "false"},
    "tz": {"spark.sql.session.timeZone": "Asia/Tokyo"},
    # granularity axes: odd, non-divisible reducer count and 1 MB scan
    # splits (maximum task fragmentation) — partition-layout hazards
    "parts": {"spark.sql.shuffle.partitions": "5"},
    "splits": {"spark.sql.files.maxPartitionBytes": "1m",
               "spark.sql.files.openCostInBytes": "0"},
}

_RUNNER = r"""
import sys
sys.path.insert(0, ".")
from etl_finance_spark import registry
from etl_finance_spark.session import get_spark
from etl_finance_spark.testing import compare, duck_connect

confs = dict(%(confs)r)
spark = get_spark("config-matrix", cpus=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
for k, v in confs.items():
    spark.conf.set(k, v)
sf = "/root/testdata/sf0.01"
con = duck_connect(sf)
bad = []
for name, spec in sorted(registry.collect().items()):
    try:
        df = spec.fn(spark, sf)
        if spec.oracle is None:
            df.count()
            continue
        ok, msg = compare(df, con, spec.oracle)
        if not ok:
            bad.append((name, msg[:200]))
    except Exception as e:  # noqa: BLE001
        bad.append((name, f"{type(e).__name__}: {e}"[:200]))
print("FAILCOUNT:", len(bad))
for n, m in bad:
    print("FAIL", n, m)
"""


def main() -> int:
    axes = sys.argv[1:] or list(AXES)
    rc = 0
    for axis in axes:
        script = _RUNNER % {"confs": AXES[axis]}
        out = subprocess.run([sys.executable, "-c", script],
                             capture_output=True, text=True, timeout=3600)
        tail = [ln for ln in out.stdout.splitlines()
                if ln.startswith(("FAILCOUNT:", "FAIL "))]
        ok = out.returncode == 0 and tail and tail[0] == "FAILCOUNT: 0"
        print(f"[{axis}] {'GREEN' if ok else 'RED'}",
              *tail[:5], sep="\n  ")
        if not ok:
            rc = 1
            print(out.stderr[-1000:])
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
