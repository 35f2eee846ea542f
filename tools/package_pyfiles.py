"""Package bucketizers_spark as a --py-files zip for spark-submit.

Usage: python tools/package_pyfiles.py [out_zip]
Writes .scratch/bucketizers_spark.zip by default.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, ".scratch", "bucketizers_spark.zip")
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "bucketizers_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                path = os.path.join(root, f)
                zf.write(path, os.path.relpath(path, REPO))
    print(out)


if __name__ == "__main__":
    main()
