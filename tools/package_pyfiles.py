"""Package the engine for ``spark-submit --py-files`` (north_star shipping
contract: the whole job ships as one zip; executors import the package from
the zip, no install step).

Usage:
    python tools/package_pyfiles.py             # -> dist/pyterrier_pisa_spark.zip
    spark-submit --master local[8] \
        --py-files dist/pyterrier_pisa_spark.zip \
        tools/submit_job.py build /data/corpus.parquet /data/idx

The zip holds only the package's .py files (no tests, no caches) — Spark
distributes it to every executor and prepends it to PYTHONPATH.
"""

import os
import zipfile


def make_zip(out_path: str | None = None) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "pyterrier_pisa_spark")
    out_path = out_path or os.path.join(root, "dist", "pyterrier_pisa_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    print(make_zip())
