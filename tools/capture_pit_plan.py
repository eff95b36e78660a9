"""Capture the physical plan of the PIT build frame (dvx.pit._pit_frame).

The declared queries read the MATERIALIZED PIT table, so their plans do
not show the build shape; this captures the build frame itself over the
entry vault at sf0.01.

Usage: python tools/capture_pit_plan.py <tag> <suffix>
Writes plans/<tag>/pit_frame_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dvx.pit import _pit_frame  # noqa: E402
from dvx.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="dvx-pit-plan")
    vault = entrymod._get_vault(spark, sf_dir)
    df = _pit_frame(vault, entrymod.PIT_DATE, vault.sat_all())
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"pit_frame_{suffix}.txt")
    with open(path, "w") as f:
        f.write(txt)
    print(f"[ok] {path}")


if __name__ == "__main__":
    main()
