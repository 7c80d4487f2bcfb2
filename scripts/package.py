#!/usr/bin/env python
"""Package dlkp_spark into dist/dlkp_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    pkg = os.path.join(ROOT, "dlkp_spark")
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "dlkp_spark.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for fname in sorted(files):
                if fname.endswith(".py"):
                    full = os.path.join(root, fname)
                    zf.write(full, os.path.join("dlkp_spark", os.path.relpath(full, pkg)))
    print(out)
    return out


if __name__ == "__main__":
    main()
