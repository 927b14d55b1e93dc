"""Package gxdindexer_spark for spark-submit --py-files.

Builds a deterministic zip of the package source (no tests, no
bytecode) that executors can import when the driver script ships it
with ``--py-files`` — the multi-executor deployment unit from the
north rule ("run via spark-submit --py-files on a multi-executor
cluster"). The reference's analog is the fat jar the buildIndex shell
wrapper invokes (bin/buildIndex:34-35).

Usage:
    python scripts/package.py [out.zip]          # default dist/gxdindexer_spark.zip
    spark-submit --master local[8] \
        --py-files dist/gxdindexer_spark.zip \
        jobs/build_index.py --synth-docs 1000 --index-dir /tmp/idx ...

Determinism: entries are added in sorted path order with a fixed
timestamp, so the same source tree always produces byte-identical
archives (useful for content-addressed deploy caches).
"""

from __future__ import annotations

import os
import sys
import zipfile

FIXED_DATE = (2020, 1, 1, 0, 0, 0)


def build_zip(repo_root: str, out_path: str) -> list[str]:
    pkg = os.path.join(repo_root, "gxdindexer_spark")
    names = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(
            d for d in dirnames if d != "__pycache__"
        )
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                names.append(
                    (os.path.relpath(full, repo_root), full)
                )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(names):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return [a for a, _ in sorted(names)]


def main() -> int:
    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(repo_root, "dist", "gxdindexer_spark.zip")
    )
    names = build_zip(repo_root, out)
    print(f"{out}: {len(names)} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
