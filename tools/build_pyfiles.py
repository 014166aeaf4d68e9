"""Build the spark-submit --py-files artifact (north rule deployment).

Zips the material_parsers_spark package — source AND bundled resources
(gazetteer patterns, classifier tables; golden oracle fixtures are
excluded, they are test artifacts) — into dist/material_parsers_spark.zip
so a cluster job needs exactly:

    spark-submit --py-files dist/material_parsers_spark.zip \
        your_driver.py ...

Usage: python tools/build_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "material_parsers_spark"

EXCLUDE_DIRS = {"__pycache__"}
# golden parquet fixtures are oracle test data, not runtime resources
EXCLUDE_PREFIXES = (os.path.join(PACKAGE, "resources", "golden")
                    + os.sep,)


def build(out_zip: str) -> str:
    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    n = 0
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PACKAGE)):
            dirs[:] = [d for d in dirs if d not in EXCLUDE_DIRS]
            for name in sorted(files):
                if name.endswith(".pyc"):
                    continue
                path = os.path.join(root, name)
                arc = os.path.relpath(path, REPO)
                if any(arc.startswith(p) for p in EXCLUDE_PREFIXES):
                    continue
                zf.write(path, arc)
                n += 1
    print(f"wrote {out_zip} ({n} files, "
          f"{os.path.getsize(out_zip) // 1024} KiB)")
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "dist", "material_parsers_spark.zip")
    build(out)
