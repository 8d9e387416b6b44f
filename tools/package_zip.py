"""Build the ``--py-files`` archive for spark-submit launches
(``BASELINE.json:north_rule`` launch requirement):

    python tools/package_zip.py            # → dist/serd_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/serd_spark.zip jobs/run_pipeline.py \\
        --rows 200000 --warehouse /data/kg

Verified in-sandbox (round 3): the zip launched from OUTSIDE the repo
directory via /opt/spark/bin/spark-submit runs the full pipeline job
(extraction → linking → bucketed materialize → manifest commit) with
the package imported from the archive alone.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "dist/serd_spark.zip") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, os.path.dirname(out)), exist_ok=True)
    out_path = os.path.join(repo, out)
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(repo, "serd_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, repo))
                    n += 1
    print(f"{out_path}: {n} modules")
    return out_path


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "dist/serd_spark.zip")
